class DeclarativeMeta(type):
    pass


def declarative_base(*args, **kwargs):
    class Base(object, metaclass=DeclarativeMeta):
        metadata = None
    return Base
