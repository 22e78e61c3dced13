from gymothelloenv_tpu.envs.vector_env import (  # noqa: F401
    VecEnvState,
    VecStepResult,
    vec_reset,
    vec_step,
)
