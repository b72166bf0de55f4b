from . import primes, modarith, ntt, rns, sampling  # noqa: F401
