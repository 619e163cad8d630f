"""No-op wandb stub so the reference's WandBLogger (utils/logger.py) runs
without network access. Every API the logger touches is a silent no-op."""


class _NoOp:
    def __call__(self, *a, **k):
        return self

    def __getattr__(self, _name):
        return self

    def update(self, *a, **k):
        pass


config = _NoOp()


class Image:
    def __init__(self, data=None, **kwargs):
        self.data = data


class Table:
    def __init__(self, columns=None, data=None, **kwargs):
        self.columns = columns
        self.data = data


class _Run(_NoOp):
    pass


def init(*a, **k):
    return _Run()


def log(*a, **k):
    pass


def finish(*a, **k):
    pass


def watch(*a, **k):
    pass
