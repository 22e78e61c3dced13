"""Torch-checkpoint import: converted weights must make the flax rebuilds
produce the SAME outputs as live torch modules of the reference
architectures (spec transcribed from SURVEY.md §2 — model.py:288-314,
dqn.py:73-127, ppo.py:29-77; no reference code imported)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn                                  # noqa: E402
import torch.nn.functional as F                        # noqa: E402

from gymothelloenv_tpu.compat.torch_import import (    # noqa: E402
    import_actor_critic, import_dqn_net, import_dueling_dqn_net,
    import_policy_net)
from gymothelloenv_tpu.models import (                 # noqa: E402
    ActorCriticNet, DQNNet, DuelingDQNNet, PolicyNet)


class TorchCNNPolicy(nn.Module):
    """Vendored Policy: CNNBase.main + critic_linear + dist.linear
    (model.py:288-314, distributions.py:59-74)."""

    def __init__(self, in_ch=4, hidden=512, num_actions=64):
        super().__init__()
        self.base = nn.Module()
        self.base.main = nn.Sequential(
            nn.Conv2d(in_ch, 32, 3, stride=2, padding=1), nn.ReLU(),
            nn.Conv2d(32, 64, 2), nn.ReLU(),
            nn.Conv2d(64, 64, 2), nn.ReLU(), nn.Flatten(),
            nn.Linear(256, hidden), nn.ReLU())
        self.base.critic_linear = nn.Linear(hidden, 1)
        self.dist = nn.Module()
        self.dist.linear = nn.Linear(hidden, num_actions)

    def forward(self, x):
        h = self.base.main(x)
        return self.dist.linear(h), self.base.critic_linear(h)[:, 0]


class TorchDQN(nn.Module):
    """dqn.py:73-95."""

    def __init__(self, in_ch=3, num_actions=64):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, 32, 3, stride=2, padding=1)
        self.conv2 = nn.Conv2d(32, 64, 2)
        self.conv3 = nn.Conv2d(64, 64, 2)
        self.fc4 = nn.Linear(256, 128)
        self.fc5 = nn.Linear(128, num_actions)

    def forward(self, x):
        x = F.relu(self.conv1(x))
        x = F.relu(self.conv2(x))
        x = F.relu(self.conv3(x))
        x = F.relu(self.fc4(x.flatten(1)))
        return self.fc5(x)


class TorchDuelingDQN(nn.Module):
    """dqn.py:97-127: Q = V + A - mean(A)."""

    def __init__(self, in_ch=3, num_actions=64):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, 32, 3, stride=2, padding=1)
        self.conv2 = nn.Conv2d(32, 64, 2)
        self.conv3 = nn.Conv2d(64, 64, 2)
        self.fc1_adv = nn.Linear(256, 128)
        self.fc1_val = nn.Linear(256, 128)
        self.fc2_adv = nn.Linear(128, num_actions)
        self.fc2_val = nn.Linear(128, 1)

    def forward(self, x):
        x = F.relu(self.conv1(x))
        x = F.relu(self.conv2(x))
        x = F.relu(self.conv3(x)).flatten(1)
        adv = self.fc2_adv(F.relu(self.fc1_adv(x)))
        val = self.fc2_val(F.relu(self.fc1_val(x)))
        return val + adv - adv.mean(dim=1, keepdim=True)


class TorchActorCritic(nn.Module):
    """ppo.py:29-77: shared trunk + fc4, fc5 policy logits, fc6 value."""

    def __init__(self, in_ch=4, num_actions=64):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, 32, 3, stride=2, padding=1)
        self.conv2 = nn.Conv2d(32, 64, 2)
        self.conv3 = nn.Conv2d(64, 64, 2)
        self.fc4 = nn.Linear(256, 128)
        self.fc5 = nn.Linear(128, num_actions)
        self.fc6 = nn.Linear(128, 1)

    def forward(self, x):
        x = F.relu(self.conv1(x))
        x = F.relu(self.conv2(x))
        x = F.relu(self.conv3(x))
        h = F.relu(self.fc4(x.flatten(1)))
        return self.fc5(h), self.fc6(h)[:, 0]


def _obs(key, n, c):
    return jax.random.normal(key, (n, c, 8, 8), jnp.float32)


def _torch_of(x):
    return torch.tensor(np.asarray(x))


def test_policy_net_import_forward_equivalence():
    torch.manual_seed(0)
    tnet = TorchCNNPolicy()
    params = import_policy_net(tnet.state_dict())
    x = _obs(jax.random.PRNGKey(1), 5, 4)
    logits, value, _ = PolicyNet(num_actions=64).apply(params, x)
    with torch.no_grad():
        tl, tv = tnet(_torch_of(x))
    np.testing.assert_allclose(np.asarray(logits), tl.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(value), tv.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_dqn_import_forward_equivalence():
    torch.manual_seed(1)
    tnet = TorchDQN()
    params = import_dqn_net(tnet.state_dict())
    x = _obs(jax.random.PRNGKey(2), 5, 3)
    q = DQNNet(num_actions=64).apply(params, x)
    with torch.no_grad():
        tq = tnet(_torch_of(x))
    np.testing.assert_allclose(np.asarray(q), tq.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_dueling_dqn_import_forward_equivalence():
    torch.manual_seed(2)
    tnet = TorchDuelingDQN()
    params = import_dueling_dqn_net(tnet.state_dict())
    x = _obs(jax.random.PRNGKey(3), 4, 3)
    q = DuelingDQNNet(num_actions=64).apply(params, x)
    with torch.no_grad():
        tq = tnet(_torch_of(x))
    np.testing.assert_allclose(np.asarray(q), tq.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_actor_critic_import_forward_equivalence_and_util_save_layout():
    torch.manual_seed(3)
    tnet = TorchActorCritic()
    # util.save layout (util.py:9-17): {'model_state_dict': ...}
    ckpt = {"episode": 7, "model_state_dict": tnet.state_dict()}
    params = import_actor_critic(ckpt)
    x = _obs(jax.random.PRNGKey(4), 6, 4)
    logits, value = ActorCriticNet(num_actions=64).apply(params, x)
    with torch.no_grad():
        tl, tv = tnet(_torch_of(x))
    np.testing.assert_allclose(np.asarray(logits), tl.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(value), tv.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_policy_net_export_roundtrip():
    """export_policy_net is the exact inverse of import_policy_net, and a
    live torch Policy loaded with the export reproduces the flax
    outputs."""
    from gymothelloenv_tpu.compat.torch_import import export_policy_net

    torch.manual_seed(5)
    src = TorchCNNPolicy()
    params = import_policy_net(src.state_dict())
    sd = export_policy_net(params)
    for k, v in src.state_dict().items():
        np.testing.assert_allclose(sd[k], v.numpy(), rtol=1e-6,
                                   err_msg=k)
    dst = TorchCNNPolicy()
    dst.load_state_dict({k: torch.tensor(v) for k, v in sd.items()})
    x = _obs(jax.random.PRNGKey(6), 3, 4)
    logits, value, _ = PolicyNet(num_actions=64).apply(params, x)
    with torch.no_grad():
        tl, tv = dst(_torch_of(x))
    np.testing.assert_allclose(np.asarray(logits), tl.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(value), tv.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_detect_and_import_identifies_all_layouts():
    from gymothelloenv_tpu.compat.torch_import import detect_and_import

    for module, want in ((TorchCNNPolicy(), "policy"),
                         (TorchDQN(), "dqn"),
                         (TorchDuelingDQN(), "dueling_dqn"),
                         (TorchActorCritic(), "actor_critic")):
        kind, params = detect_and_import(module.state_dict())
        assert kind == want
        assert "ConvTrunk_0" in params["params"]
    with pytest.raises(ValueError):
        detect_and_import({"mystery.weight": np.zeros((2, 2))})
