"""Profile the Base train step on-chip and rank ops by device time.

Runs a few real training steps under ``jax.profiler.trace`` and digests the
XPlane trace into a per-op (fusion/custom-call) time table, so the "next
perf lever" question is answered by measurement, not estimation
(docs/BENCHMARKS.md roofline). The reference has no profiling story at all
(SURVEY §5: tqdm postfix lines only).

Usage (TPU):
    python tools/profile_step.py [--batch 35] [--steps 5] [--mode train]
    python tools/profile_step.py --trace_dir /tmp/prof   # digest existing
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def digest(trace_dir: str, top: int = 30):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # device lanes: pid whose process name mentions TPU/TensorCore (the host
    # python threads otherwise swamp the table with dispatch noise)
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_name.items()
                   if "TPU" in n or "/device" in n.lower()}

    op_total = defaultdict(float)
    op_count = defaultdict(int)
    lane_total = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        lane = tid_name.get((e["pid"], e["tid"]), "")
        # XLA op lanes; skip the step/module summary lanes
        if "XLA Modules" in lane or "Steps" in lane:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        op_total[name] += dur
        op_count[name] += 1
        lane_total[lane] += dur

    print(f"\n== lanes (total ms over the traced window) ==")
    for lane, ms in sorted(lane_total.items(), key=lambda kv: -kv[1])[:8]:
        print(f"  {ms:10.2f} ms  {lane}")

    grand = sum(op_total.values())
    print(f"\n== top {top} ops by device time (grand total {grand:.1f} ms) ==")
    for name, ms in sorted(op_total.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {ms:9.2f} ms {100 * ms / grand:5.1f}%  x{op_count[name]:<4d} "
              f"{name[:110]}")

    # group by op family: strip trailing .<digits> and collapse .remat
    import re
    fam_total = defaultdict(float)
    fam_count = defaultdict(int)
    for name, ms in op_total.items():
        fam = re.sub(r"\.\d+", "", name)
        fam_total[fam] += ms
        fam_count[fam] += op_count[name]
    print(f"\n== op families ==")
    for fam, ms in sorted(fam_total.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {ms:9.2f} ms {100 * ms / grand:5.1f}%  x{fam_count[fam]:<5d} "
              f"{fam[:110]}")

    # rough buckets by substring
    buckets = {
        "flash attention (pallas)": ("flash", "mosaic", "custom-call"),
        "fusion (matmul+elementwise)": ("fusion",),
        "convolution": ("convolution", "conv"),
        "copy/transpose": ("copy", "transpose", "bitcast"),
        "reduce/all-reduce": ("reduce", "all-"),
    }
    print("\n== buckets ==")
    seen = set()
    for label, keys in buckets.items():
        ms = sum(v for k, v in op_total.items()
                 if any(s in k.lower() for s in keys) and k not in seen)
        for k in op_total:
            if any(s in k.lower() for s in keys):
                seen.add(k)
        print(f"  {ms:10.2f} ms {100 * ms / grand:5.1f}%  {label}")
    other = sum(v for k, v in op_total.items() if k not in seen)
    print(f"  {other:10.2f} ms {100 * other / grand:5.1f}%  (other)")


def run_and_trace(args):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from synergy_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from synergy_tpu.configs import CLIPConfig, TrainConfig
    from synergy_tpu.models.tri_clip import TriCLIP
    from synergy_tpu.train.state import create_train_state, make_train_step

    cfg = CLIPConfig.base() if args.size == "base" else CLIPConfig.large()
    model = TriCLIP(cfg, dtype=jnp.bfloat16)

    b = args.batch
    rng_np = np.random.default_rng(0)
    batch = {
        "pixel_values": jnp.asarray(rng_np.standard_normal(
            (b, 3, cfg.vision.image_size, cfg.vision.image_size)), jnp.float32),
        "input_ids": jnp.asarray(
            rng_np.integers(4, cfg.text.vocab_size, (b, 32)), jnp.int32),
        "attention_mask": jnp.ones((b, 32), jnp.int32),
        "input_values": jnp.asarray(rng_np.standard_normal(
            (b, cfg.audio.max_length, cfg.audio.num_mel_bins)), jnp.float32),
    }
    train_cfg = TrainConfig(per_device_batch=b, accum_steps=1)
    state = create_train_state(jax.random.PRNGKey(0), model, train_cfg, batch)
    key = jax.random.PRNGKey(1)

    if args.mode == "infer":
        params = state.params

        @jax.jit
        def step_fn(params, batch):
            return model.apply(
                {"params": params}, batch["pixel_values"],
                batch["input_ids"], batch["attention_mask"],
                batch["input_values"])

        out = step_fn(params, batch)
        # axon gotcha: block_until_ready does not sync through the tunnel;
        # force a host transfer (same pattern as bench.py)
        float(jnp.sum(out["image_embeds"]))
        jax.profiler.start_trace(args.trace_dir)
        for i in range(args.steps):
            with jax.profiler.StepTraceAnnotation("bench", step_num=i):
                out = step_fn(params, batch)
        float(jnp.sum(out["image_embeds"]))
        jax.profiler.stop_trace()
        print(f"[profile] trace written to {args.trace_dir}")
        return

    step_fn = jax.jit(make_train_step(model, train_cfg, num_groups=1),
                      donate_argnums=0)
    # warm up (compile) OUTSIDE the trace
    state, m = step_fn(state, batch, key)
    float(jnp.sum(m["loss"])) if isinstance(m, dict) and "loss" in m else \
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), m)

    jax.profiler.start_trace(args.trace_dir)
    for i in range(args.steps):
        with jax.profiler.StepTraceAnnotation("bench", step_num=i):
            state, m = step_fn(state, batch, key)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), m)
    jax.profiler.stop_trace()
    print(f"[profile] trace written to {args.trace_dir}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=35)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--mode", choices=["train", "infer"], default="train")
    p.add_argument("--size", choices=["base", "large"], default="base")
    p.add_argument("--trace_dir", type=str, default="/tmp/synergy_prof")
    p.add_argument("--digest_only", action="store_true",
                   help="only digest an existing trace")
    p.add_argument("--top", type=int, default=30)
    args = p.parse_args()
    if not args.digest_only:
        run_and_trace(args)
    digest(args.trace_dir, args.top)


if __name__ == "__main__":
    main()
