# Import-time-only stand-in: lets the read-only reference package import so
# its parser/graph/export modules can be driven for golden-fixture generation.
# The SQL-backed Manager is never instantiated.


class _Anything:
    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, *args, **kwargs):
        return _Anything()

    def __getattr__(self, name):
        return _Anything()


def _factory(*args, **kwargs):
    return _Anything()


Column = Table = ForeignKey = Index = UniqueConstraint = _factory
Integer = String = Text = DateTime = Boolean = Date = LargeBinary = _Anything()
and_ = or_ = exists = func = _Anything()


def create_engine(*args, **kwargs):
    return _Anything()


class _Inspect(_Anything):
    pass


inspect = _Inspect()
