"""n-step FIFO vs a Python oracle of DQNAgent's buffer logic
(dqn.py:288-350, :469-473)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gymothelloenv_tpu.agents.nstep import nstep_init, nstep_push


def oracle_push(buffer, R_state, gamma, n, trans):
    """Reference semantics: returns (emitted list, buffer).  ``trans`` =
    (s, a, r, s', done) with s encoded as an int."""
    out = []
    buffer.append(trans)
    s, a, r, s_, done = trans
    if done:
        while buffer:
            m = len(buffer)
            R = sum(buffer[k][2] * gamma ** k for k in range(m))
            out.append((buffer[0][0], buffer[0][1], R,
                        buffer[m - 1][3], buffer[m - 1][4]))
            buffer.pop(0)
    elif len(buffer) >= n:
        R = sum(buffer[k][2] * gamma ** k for k in range(n))
        out.append((buffer[0][0], buffer[0][1], R,
                    buffer[n - 1][3], buffer[n - 1][4]))
        buffer.pop(0)
    return out, buffer


@pytest.mark.parametrize("n", [1, 2, 3])
def test_nstep_matches_oracle(n):
    gamma = 0.9
    N = 4                      # parallel streams
    B = 4
    rng = np.random.RandomState(n)
    fifo = nstep_init(n, N, B)
    oracle_buffers = [[] for _ in range(N)]
    oracle_out = [[] for _ in range(N)]
    got_out = [[] for _ in range(N)]

    for step in range(60):
        # Random per-stream transitions; encode "state" in board[0,0].
        s_id = rng.randint(-100, 100, N)
        a = rng.randint(0, 16, N)
        r = rng.randn(N).round(2)
        s2_id = rng.randint(-100, 100, N)
        done = rng.rand(N) < 0.15
        do = rng.rand(N) < 0.9

        board = np.zeros((N, B, B), np.int8)
        board[:, 0, 0] = np.clip(s_id, -100, 100) % 100 - 50
        nboard = np.zeros((N, B, B), np.int8)
        nboard[:, 0, 0] = np.clip(s2_id, -100, 100) % 100 - 50

        fifo, em = nstep_push(
            fifo, gamma,
            jnp.asarray(board), jnp.asarray(s_id % 3 - 1, jnp.int8),
            jnp.asarray(a, jnp.int32), jnp.asarray(r, jnp.float32),
            jnp.asarray(nboard), jnp.asarray(s2_id % 3 - 1, jnp.int8),
            jnp.asarray(done), jnp.asarray(do))

        valid = np.asarray(em.valid)
        for i in range(N):
            if do[i]:
                emitted, oracle_buffers[i] = oracle_push(
                    oracle_buffers[i], None, gamma, n,
                    (board[i, 0, 0], a[i], float(r[i]),
                     nboard[i, 0, 0], bool(done[i])))
                oracle_out[i].extend(emitted)
            for k in range(n):
                if valid[k, i]:
                    got_out[i].append((
                        int(np.asarray(em.board)[k, i, 0, 0]),
                        int(np.asarray(em.action)[k, i]),
                        float(np.asarray(em.reward)[k, i]),
                        int(np.asarray(em.next_board)[k, i, 0, 0]),
                        bool(np.asarray(em.done)[k, i])))

    for i in range(N):
        assert len(got_out[i]) == len(oracle_out[i]), f"stream {i}"
        for got, want in zip(got_out[i], oracle_out[i]):
            assert got[0] == want[0] and got[1] == want[1], (got, want)
            np.testing.assert_allclose(got[2], want[2], rtol=1e-5,
                                       atol=1e-6)
            assert got[3] == want[3] and got[4] == want[4], (got, want)
