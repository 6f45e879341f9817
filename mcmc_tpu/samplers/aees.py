"""Placeholder — implemented in a later milestone this round."""


def aees(*args, **kwargs):
    raise NotImplementedError("aees: under construction")
