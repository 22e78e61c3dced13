from gymothelloenv_tpu.envs.bit_vector_env import (  # noqa: F401
    BitVecEnvState,
    BitVecStepResult,
    bitvec_reset,
    bitvec_step,
)
from gymothelloenv_tpu.envs.vector_env import (  # noqa: F401
    VecEnvState,
    VecStepResult,
    vec_reset,
    vec_step,
)
