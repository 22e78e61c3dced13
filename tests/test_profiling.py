"""utils/profiling: trace summarizer (synthetic perfetto trace) and
StepTimer basics."""

import gzip
import json
import os

from gymothelloenv_tpu.utils.profiling import (StepTimer, format_op_table,
                                               summarize_trace)


def _write_trace(tmp_path):
    events = [
        # Track metadata: device pid 3 with an 'XLA Ops' thread, host pid 7.
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 3, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 7, "tid": 1, "name": "thread_name",
         "args": {"name": "python"}},
        # Device ops: two occurrences of one fusion, one convolution,
        # a while wrapper (must be dropped), and a host event (dropped).
        {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.7", "dur": 100,
         "ts": 0, "args": {"source": "/x/gymothelloenv_tpu/agents/ppo.py:1",
                           "tf_op": "jit(f)/gather:"}},
        {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.7", "dur": 50,
         "ts": 200, "args": {}},
        {"ph": "X", "pid": 3, "tid": 3, "name": "convolution.2", "dur": 30,
         "ts": 400, "args": {"source": "flax/linen/linear.py:1",
                             "tf_op": "jit(f)/conv:"}},
        {"ph": "X", "pid": 3, "tid": 3, "name": "while.9", "dur": 500,
         "ts": 0, "args": {}},
        {"ph": "X", "pid": 3, "tid": 3, "name": "conditional.4",
         "dur": 400, "ts": 0, "args": {}},
        {"ph": "X", "pid": 7, "tid": 1, "name": "hostwork", "dur": 900,
         "ts": 0, "args": {}},
    ]
    d = tmp_path / "plugins" / "profile" / "run1"
    os.makedirs(d)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def test_summarize_trace_aggregates_device_ops(tmp_path):
    ops = summarize_trace(_write_trace(tmp_path))
    names = [o.name for o in ops]
    assert names == ["fusion.7", "convolution.2"]  # sorted by total time
    assert ops[0].total_us == 150 and ops[0].count == 2
    assert ops[0].source == "gymothelloenv_tpu/agents/ppo.py:1"
    assert ops[1].total_us == 30
    table = format_op_table(ops)
    assert "leaf device total: 0.2 ms" in table
    assert "fusion.7" in table and "while.9" not in table
    assert "hostwork" not in table


def test_step_timer_discards_warmup():
    t = StepTimer(warmup=1)
    for _ in range(3):
        with t.measure():
            pass
    assert len(t.times) == 2
    assert t.summary()["n"] == 2
