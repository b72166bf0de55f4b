from .params import CkksParams, CkksContext, REFERENCE_MODULI, REFERENCE_ROOTS  # noqa: F401
