import requests


def download(*args, **kwargs):
    raise NotImplementedError


def get_iso_8601_date():
    return '00000000'
