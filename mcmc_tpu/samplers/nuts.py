"""Placeholder — implemented in a later milestone this round."""


def nuts(*args, **kwargs):
    raise NotImplementedError("nuts: under construction")
