class OperationalError(Exception):
    pass


class IntegrityError(Exception):
    pass
