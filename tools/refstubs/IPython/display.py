class Javascript:
    def __init__(self, *args, **kwargs):
        pass
