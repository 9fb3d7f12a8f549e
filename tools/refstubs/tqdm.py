# Minimal stand-in so the read-only reference package imports for golden-fixture
# generation (no progress bars needed).


def tqdm(iterable=None, *args, **kwargs):
    if iterable is None:
        return _Dummy()
    return iterable


class _Dummy:
    def update(self, *a, **k):
        pass

    def close(self):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False
