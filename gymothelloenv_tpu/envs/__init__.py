from gymothelloenv_tpu.envs.bit_vector_env import (  # noqa: F401
    BitVecEnvState,
    BitVecStepResult,
    bitvec_reset,
    bitvec_step,
)
from gymothelloenv_tpu.envs.vec_wrappers import (  # noqa: F401
    FrameStackState,
    RunningMeanStd,
    TimeLimitState,
    VecNormState,
    frame_stack_init,
    frame_stack_step,
    rms_init,
    rms_normalize,
    rms_update,
    rms_update_masked,
    time_limit_init,
    time_limit_step,
    vecnorm_init,
    vecnorm_obs,
    vecnorm_reward,
)
from gymothelloenv_tpu.envs.vector_env import (  # noqa: F401
    VecEnvState,
    VecStepResult,
    vec_reset,
    vec_step,
)
