def get_famplex_url(*args, **kwargs):
    raise NotImplementedError


def get_github_url(*args, **kwargs):
    raise NotImplementedError
