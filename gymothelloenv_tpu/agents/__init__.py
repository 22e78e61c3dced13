from gymothelloenv_tpu.agents.a2c import (  # noqa: F401
    A2CConfig,
    a2c_update,
    make_a2c_optimizer,
)
from gymothelloenv_tpu.agents.dqn import DQNConfig, DQNState, dqn_init  # noqa: F401
from gymothelloenv_tpu.agents.gail import (  # noqa: F401
    Discriminator,
    ExpertDataset,
    GAILConfig,
    gail_discriminator_update,
    gail_init,
    gail_predict_reward,
)
from gymothelloenv_tpu.agents.ppo import (  # noqa: F401
    PPOConfig,
    Transition,
    compute_gae,
    compute_gae_masked,
    compute_gae_time_limits,
    make_optimizer,
    ppo_loss,
    ppo_update,
)
from gymothelloenv_tpu.agents.replay import (  # noqa: F401
    Replay,
    ReplayConfig,
    replay_init,
)
from gymothelloenv_tpu.agents.simple_ppo import (  # noqa: F401
    SimplePPOConfig,
    simple_ppo_update,
)
from gymothelloenv_tpu.agents.kfac import (  # noqa: F401
    ACKTRAgent,
    ACKTRConfig,
    ConvSpec,
    DenseSpec,
    acktr_conv_init,
    acktr_init,
    acktr_update,
    conv_trunk_specs,
    stack_apply,
    stack_init,
)
