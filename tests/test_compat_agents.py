"""Compat learned-agent classes through the reference driver protocol."""

import os

import numpy as np

from gymothelloenv_tpu.cli.run_2agent import play as play_2agent
from gymothelloenv_tpu.compat import SimpleOthelloEnv
from gymothelloenv_tpu.compat.agents import DQNAgent, PPO
from gymothelloenv_tpu.compat.featurize import make_state3, make_state4


def test_ppo_agent_protocol(tmp_path):
    env = SimpleOthelloEnv(board_size=8, mute=True)
    agent = PPO("test_ppo", 8, update_timestep=64, batch_size=32)
    agent.reset(env)
    env.reset()
    os.chdir(tmp_path)   # *_output.txt lands here
    np.random.seed(0)
    for episode in range(2):
        env.reset()
        done = False
        while not done:
            s = make_state4(env)
            a = agent.get_action(s)
            assert a in env.possible_moves
            _, r, done, _ = env.step(a)
            agent.run(s, a, r, done, make_state4(env))
    assert agent.timestep > 50
    agent.save(str(tmp_path / "ppo.msgpack"), episode=2, loss=0.1)
    agent2 = PPO("test_ppo2", 8)
    ep, loss = agent2.load(str(tmp_path / "ppo.msgpack"))
    assert ep == 2 and abs(loss - 0.1) < 1e-9


def test_dqn_agent_protocol(tmp_path):
    env = SimpleOthelloEnv(board_size=8, mute=True)
    agent = DQNAgent("test_dqn", 8, replay_memory_size=5000,
                     initial_replay_size=40, n_step=2)
    agent.reset(env)
    os.chdir(tmp_path)
    np.random.seed(0)
    for episode in range(2):
        env.reset()
        done = False
        while not done:
            s = make_state3(env)
            a = agent.get_action(s)
            assert a in env.possible_moves
            _, r, done, _ = env.step(a)
            agent.run(s, a, r, done, make_state3(env))
    assert agent.t > 40                     # transitions flowed to replay
    assert int(agent.replay.size) == agent.t
    env.reset()
    a = agent.get_test_action(make_state3(env))
    assert a in env.possible_moves


def test_run_2agent_driver_smoke(tmp_path):
    os.chdir(tmp_path)
    np.random.seed(1)
    w, d, l = play_2agent(protagonist=-1, protagonist_agent_type="rand",
                          opponent_agent_type="greedy", num_rounds=3,
                          env_init_rand_steps=4)
    assert w + d + l == 3
