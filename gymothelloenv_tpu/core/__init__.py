from gymothelloenv_tpu.core import bitops, featurize, state  # noqa: F401
