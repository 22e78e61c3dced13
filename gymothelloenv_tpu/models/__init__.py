from gymothelloenv_tpu.models.distributions import (  # noqa: F401
    BernoulliDist, DiagNormal, MaskedCategorical)
from gymothelloenv_tpu.models.nets import (  # noqa: F401
    ActorCriticNet,
    BernoulliHead,
    ConvTrunk,
    DiagGaussianHead,
    DQNNet,
    DuelingDQNNet,
    GRUCore,
    MLPBase,
    PolicyNet,
    masked_dist,
)
