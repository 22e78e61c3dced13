from gymothelloenv_tpu.policies.scripted import (  # noqa: F401
    greedy_action,
    greedy_policy,
    make_policy,
    maximin_action,
    maximin_policy,
    random_action,
    random_policy,
)
