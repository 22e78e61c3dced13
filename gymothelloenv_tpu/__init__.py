"""gymothelloenv_tpu — a TPU-native (JAX/XLA/pjit/pallas) Othello RL framework.

A from-scratch rebuild of the capabilities of ``omurammm/GymOthelloEnv``
(mounted read-only at /root/reference) designed TPU-first: the rules engine is
batched boolean-plane algebra under ``jit``/``vmap``, policies and training
loops run entirely on device, and scale-out uses ``jax.sharding`` meshes with
XLA collectives instead of the reference's multiprocess pipe protocol.
"""

from gymothelloenv_tpu.core.state import (  # noqa: F401
    BLACK_DISK,
    NO_DISK,
    WHITE_DISK,
    EnvConfig,
    OthelloState,
    StepResult,
    legal_actions,
    observe,
    reset,
    step,
    step_autoreset,
)

__version__ = "0.1.0"
