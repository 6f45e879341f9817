"""Placeholder — implemented in a later milestone this round."""


def rmhmc(*args, **kwargs):
    raise NotImplementedError("rmhmc: under construction")
