from . import automorph, bconv, keyswitch, modmath, ntt, rescale  # noqa: F401
