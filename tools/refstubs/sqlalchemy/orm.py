class _Anything:
    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, *args, **kwargs):
        return _Anything()

    def __getattr__(self, name):
        return _Anything()


def relationship(*args, **kwargs):
    return _Anything()


def backref(*args, **kwargs):
    return _Anything()


def scoped_session(*args, **kwargs):
    return _Anything()


def sessionmaker(*args, **kwargs):
    return _Anything()


def aliased(*args, **kwargs):
    return _Anything()


class query:
    class Query:
        pass
