from . import modmath, ntt, rq, decompose  # noqa: F401
