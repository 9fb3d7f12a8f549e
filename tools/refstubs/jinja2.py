class Environment:
    def __init__(self, *args, **kwargs):
        pass

    def get_template(self, *args, **kwargs):
        raise NotImplementedError


class FileSystemLoader:
    def __init__(self, *args, **kwargs):
        pass


class Template:
    def __init__(self, *args, **kwargs):
        pass
