from gymothelloenv_tpu.compat.envs import (  # noqa: F401
    BLACK_DISK,
    NO_DISK,
    WHITE_DISK,
    OthelloBaseEnv,
    OthelloEnv,
    SimpleOthelloEnv,
)
from gymothelloenv_tpu.compat.policies import (  # noqa: F401
    GreedyPolicy,
    HumanPolicy,
    MaxiMinPolicy,
    RandomPolicy,
)
