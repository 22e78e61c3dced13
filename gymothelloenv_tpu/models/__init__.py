from gymothelloenv_tpu.models.distributions import MaskedCategorical  # noqa: F401
from gymothelloenv_tpu.models.nets import (  # noqa: F401
    ActorCriticNet,
    ConvTrunk,
    DQNNet,
    DuelingDQNNet,
    GRUCore,
    MLPBase,
    PolicyNet,
    masked_dist,
)
