"""Placeholder — implemented in a later milestone this round."""


def de(*args, **kwargs):
    raise NotImplementedError("de: under construction")
