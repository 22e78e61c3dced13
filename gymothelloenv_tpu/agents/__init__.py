from gymothelloenv_tpu.agents.ppo import (  # noqa: F401
    PPOConfig,
    Transition,
    compute_gae,
    make_optimizer,
    ppo_loss,
    ppo_update,
)
