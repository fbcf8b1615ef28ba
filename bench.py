"""Benchmark harness: flagship train-step throughput in mixtures/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: full jitted training step (fwd+bwd+Adam update) of the flagship
bilstm-orig DaNet under the reference default hyperparameters
(/root/reference/default.json: BATCH_SIZE=32, MAX_N_SIGNAL=2,
MAX_TRAIN_LEN=128, FFT_SIZE=256 -> F=129) — i.e. the per-step work of
`python main.py -m train` with the paper encoder.

Dispatch shape (since r4): the measured program is the SHIPPING one —
configs/tpu.json sets TRAIN_STEPS_PER_CALL, so the production Trainer
dispatches one scanned k-step program per host call and the bench times
the identical scanned program (the JSON records "steps_per_call").
Per-step math, batch and hparams are unchanged from r1-r3; earlier
rounds dispatched k=1, which on a tunneled backend under-reports the
chip by the per-call RTT (BENCH_r02 5486 per-call vs 6016 on-device,
PARITY.md perf table).

Dev switches: `--encoder KEY` benches another encoder family,
`--model tasnet-v1` benches the waveform-domain Conv-TasNet family,
`--batch N` probes batch scaling of the latency-bound recurrent step,
`--sweep` prints a per-family table (throughput + TFLOP/s + MFU) for the
PARITY.md perf section.  The driver-facing default stays ONE JSON line.

MFU accounting: XLA's cost_analysis cannot see inside Pallas custom
calls, so when the measured step used the Pallas RNN kernels the FLOPs
are counted on an XLA-scan lowering of the SAME step (identical math,
fully visible to the cost model) — the reported MFU is truthful for the
Pallas path rather than understated.

Baseline: the reference publishes NO numbers (BASELINE.md); the BASELINE.md
target is ">=5x mixtures/sec/chip over CPU TF1 baseline".  As the TF1 stack
cannot run here, the stand-in baseline is this same workload measured on
this container's CPU backend (run `python bench.py --cpu-baseline` to
re-measure; the committed constant below is from that measurement).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

# measured via `python bench.py --cpu-baseline` on this container's CPU
# (see module docstring) — mixtures/sec for the identical train step.
CPU_BASELINE_MIX_PER_SEC = 5.42

BATCH = 32
N_SIGNAL = 2
T = 128
FORCE_BACKEND = None  # set to 'xla' to bypass the Pallas kernel
ENCODER = "bilstm-orig"  # flagship default; --encoder overrides (dev use)
MODEL = "danet"  # MODEL_TYPE; --model tasnet-v1 benches the TasNet family

# extra hparams applied on top of the pinned defaults (the shipping-
# flagship arm loads configs/tpu.json here so the measured program IS
# the shipping one — ADVICE r4: the arm previously adopted only
# ENCODER_TYPE and measured bench defaults for everything else)
CONFIG_OVERRIDES = None
# config keys that do not shape the compiled train step (wire/driver/
# eval concerns measured elsewhere: benchmarks/steps_per_call.py for the
# wire, the Trainer loop for the rest) — recorded as not_applied so the
# artifact says exactly what the shipping measurement covers
_NON_STEP_KEYS = (
    "DATASET_TYPE", "TRANSFER_DOMAIN", "TRANSFER_DTYPE", "WAVE_PCM_SCALE",
    "SUMMARY_TITLE", "METRICS_EVERY", "WATCHDOG_SECS", "EVAL_SI_SNR",
    "EVAL_SDR", "LR_DECAY_TYPE", "TRAIN_STEPS_PER_CALL")


def build_step(force_backend=None):
    import os
    import jax
    import optax
    from danet_tpu.hparams import hparams
    import danet_tpu  # noqa: F401
    from danet_tpu import optim as optim_lib

    hparams.load_json(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "default.json"))
    hparams.MODEL_TYPE = MODEL
    hparams.ENCODER_TYPE = ENCODER
    hparams.BATCH_SIZE = BATCH
    # Shipping TPU training config (configs/tpu.json): Pallas full-scan
    # LSTM kernel (auto on TPU) + bf16 compute with f32 master params.
    # Measured on v5e: xla+f32 3062 -> pallas+f32 4634 -> pallas+bf16 5233
    # mixtures/sec; loss trajectories match.
    hparams.COMPUTE_DTYPE = "bfloat16"
    if CONFIG_OVERRIDES:
        for k, v in CONFIG_OVERRIDES.items():
            if k not in _NON_STEP_KEYS:
                setattr(hparams, k, v)
        # globals still pin the workload identity (mixtures/s math)
        hparams.MODEL_TYPE = MODEL
        hparams.BATCH_SIZE = BATCH
    fb = force_backend if force_backend is not None else FORCE_BACKEND
    if fb:
        hparams.LSTM_BACKEND = fb
    hparams.digest()

    model = hparams.get_model()()
    optimizer = optim_lib.make_optimizer(hparams)
    params = model.init(jax.random.PRNGKey(0))
    opt_state = jax.jit(optimizer.init)(params)
    src = jax.device_put(np.random.RandomState(0).randn(
        BATCH, N_SIGNAL, T, hparams.FEATURE_SIZE, 2).astype(np.float32))

    @jax.jit
    def train_step(params, opt_state, src_ri):
        (loss, aux), grads = jax.value_and_grad(
            model.train_loss, has_aux=True)(params, src_ri, None)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step, params, opt_state, src


_PEAK_BF16_TFLOPS = {
    # per-chip bf16 peak, TFLOP/s (public TPU specs)
    "TPU v5 lite": 197.0,  # v5e
    "TPU v5p": 459.0,
    "TPU v4": 275.0,
    "TPU v3": 123.0,
    "TPU v6 lite": 918.0,  # Trillium
}


def step_flops(step, *args):
    """XLA's own FLOP count for one compiled step (None if the backend's
    cost model does not report it)."""
    try:
        ca = step.lower(*args).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        return float(ca["flops"])
    except Exception:
        return None


def step_flops_truthful(measured_step, *measured_args):
    """Step FLOPs with Pallas custom calls accounted for.

    cost_analysis sees zero FLOPs inside a Pallas kernel, so when the
    measured step resolved to the Pallas RNN backend, rebuild the SAME
    step on the XLA-scan backend (identical math, one extra compile,
    never executed) and count THAT lowering; otherwise count the
    measured step directly."""
    from danet_tpu.ops.rnn import lstm_backend_default
    # only RNN-bearing families can resolve to the Pallas RNN kernels —
    # gating on the encoder family avoids a wasted full second compile
    # (~40-90 s remote) for attn/tcn/tasnet sweep rows whose measured
    # step cost_analysis is already complete
    step_has_rnn = MODEL == "danet" and any(
        k in ENCODER for k in ("lstm", "gru", "dprnn"))
    if (step_has_rnn and FORCE_BACKEND != "xla"
            and lstm_backend_default() == "pallas"):
        try:
            step, params, opt_state, src = build_step(force_backend="xla")
            flops = step_flops(step, params, opt_state, src)
            if flops:
                return flops
        except Exception as e:
            # an understated MFU must be visible, not silent (ADVICE r3)
            sys.stderr.write(
                "[bench] truthful-FLOPs XLA rebuild failed (%s: %s) — "
                "falling back to the Pallas-opaque cost model; the "
                "reported MFU understates the RNN kernels\n"
                % (type(e).__name__, e))
    return step_flops(measured_step, *measured_args)


def mfu_stats(step, params, opt_state, src, mix_per_sec: float):
    """Achieved TFLOP/s and model FLOPs utilization vs the chip's bf16
    peak (VERDICT r1 'no MFU accounting').  Returns (tflops, mfu_pct),
    either may be None off-TPU/unknown chips."""
    import jax
    flops = step_flops_truthful(step, params, opt_state, src)
    if not flops:
        return None, None
    tflops = flops * (mix_per_sec / BATCH) / 1e12
    kind = getattr(jax.devices()[0], "device_kind", "")
    peak = _PEAK_BF16_TFLOPS.get(kind)
    return (round(tflops, 2),
            round(100.0 * tflops / peak, 1) if peak else None)


def build_chained(n: int):
    """One compiled program running `n` train steps back-to-back
    (lax.scan over the step, same batch).  Removes per-step host
    dispatch from the measurement — and since r4 this IS the shipping
    dispatch shape: configs/tpu.json sets TRAIN_STEPS_PER_CALL, so the
    production Trainer loop runs the same scanned multi-step program
    per call (train/trainer.py::_build_steps)."""
    import jax
    step, params, opt_state, src = build_step()

    @jax.jit
    def chained(params, opt_state, src_ri):
        def body(carry, _):
            p, o = carry
            p, o, loss = step(p, o, src_ri)
            return (p, o), loss
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), None, length=n)
        return params, opt_state, losses[-1]

    return chained, (step, params, opt_state, src)


def measure_chained(n_chain: int, n_warmup: int = 2, n_iters: int = 10):
    chained, (_, params, opt_state, src) = build_chained(n_chain)
    for _ in range(n_warmup):
        params, opt_state, loss = chained(params, opt_state, src)
    assert np.isfinite(float(loss))
    t0 = time.perf_counter()
    for _ in range(n_iters):
        params, opt_state, loss = chained(params, opt_state, src)
    assert np.isfinite(float(loss))
    dt = time.perf_counter() - t0
    return BATCH * n_iters * n_chain / dt


def _ancestor_pids():
    import os
    pids, pid = set(), os.getpid()
    while pid > 1:
        pids.add(pid)
        try:
            with open("/proc/%d/status" % pid) as f:
                pid = next(int(ln.split()[1]) for ln in f
                           if ln.startswith("PPid:"))
        except (OSError, StopIteration, ValueError):
            break
    return pids


def other_tpu_processes():
    """Other live python processes that look like TPU users of this repo
    (training/eval/bench drivers).  A concurrent TPU process serializes
    the single tunnel grant and corrupts the measurement — the exact
    failure that contaminated BENCH_r03 (a live training recipe made the
    pinned workload read 3.5x slower).  Read-only /proc scan; never
    signals anything."""
    import os
    skip = _ancestor_pids()
    repo = os.path.dirname(os.path.abspath(__file__))
    # entry points of THIS repo only: "main.py"/"bench.py" are among the
    # most common python entry names on any machine, so a bare-name match
    # would flag unrelated projects' processes as rivals (false
    # "contended", discarding a clean artifact) — require either an
    # absolute path under this repo in the argv, or a repo-specific
    # module/script marker
    markers = ("danet_tpu", "eval_checkpoint", "synth_extended",
               "steps_per_call", "tail_profile", "long_context",
               repo + "/")
    generic = ("main.py", "bench.py", "experiments/")
    hits = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit() or int(pid) in skip:
            continue
        try:
            with open("/proc/%s/cmdline" % pid, "rb") as f:
                argv = f.read().decode("utf-8", "replace").split("\0")
        except OSError:
            continue
        # argv[0] must BE a python interpreter: a shell (bash -c '...')
        # that merely QUOTES "python bench.py" in its command string is a
        # launcher/monitor, not a TPU user, and flagging it poisons the
        # artifact with a false "contended" (observed r4: the launching
        # shell's sleep/tail line tripped the scan).
        exe = os.path.basename(argv[0]) if argv and argv[0] else ""
        if not exe.startswith("python"):
            continue
        cmd = " ".join(a for a in argv if a)
        try:
            cwd = os.readlink("/proc/%s/cwd" % pid)
        except OSError:
            cwd = ""
        in_repo = (cwd == repo or cwd.startswith(repo + os.sep)
                   or (repo + "/") in cmd)
        # a SECOND checkout of this repo running bare `python main.py`
        # from its own cwd matches neither the path markers nor
        # 'danet_tpu' in argv — but its cwd holds a danet_tpu package,
        # which is rival enough (ADVICE r4)
        other_checkout = bool(cwd) and not in_repo and os.path.isdir(
            os.path.join(cwd, "danet_tpu"))
        if (any(m in cmd for m in markers)
                or ((in_repo or other_checkout)
                    and any(m in cmd for m in generic))):
            # a CPU-pinned process cannot hold the device grant and is
            # NOT a rival (observed r5: the full test suite's subprocess
            # CLI tests — spawned with JAX_PLATFORMS=cpu and the axon
            # pool env dropped — stalled a bench capture for nothing).
            # Either marker suffices: the tests/conftest recipe sets
            # both.
            try:
                with open("/proc/%s/environ" % pid, "rb") as f:
                    penv = f.read().split(b"\0")
            except OSError:
                penv = []
            if penv and (b"JAX_PLATFORMS=cpu" in penv
                         or not any(e.startswith(b"PALLAS_AXON_POOL_IPS=")
                                    for e in penv)):
                continue
            hits.append("%s: %s" % (pid, cmd.strip()[:120]))
    return hits


def wait_for_rivals(max_wait_secs: float = 600.0, poll_secs: float = 15.0):
    """Bounded wait for concurrent TPU users to drain before measuring.

    Three straight rounds' artifacts were contaminated or flagged because
    the measurement raced the build queue (VERDICT r4 item 1b): waiting
    out a finishing recipe produces a CLEAN number; only if the rival
    outlives the budget do we measure anyway and keep the honest
    contended flag.  Returns (rivals_now, waited_secs)."""
    rivals = other_tpu_processes()
    if not rivals:
        return rivals, 0.0
    t0 = time.monotonic()
    sys.stderr.write(
        "[bench] concurrent TPU process(es) detected — waiting up to "
        "%.0f s for them to exit:\n  %s\n"
        % (max_wait_secs, "\n  ".join(rivals)))
    while rivals and time.monotonic() - t0 < max_wait_secs:
        time.sleep(poll_secs)
        rivals = other_tpu_processes()
    waited = time.monotonic() - t0
    sys.stderr.write(
        "[bench] %s after %.0f s\n"
        % ("rivals drained" if not rivals
           else "rival(s) still alive — measuring contended", waited))
    return rivals, waited


def contention_from_blocks(block_times, ratio: float = 1.6):
    """Timing-variance tripwire: with the chip to ourselves, equal-size
    blocks of an identical compiled step take near-identical time; a
    concurrent TPU process makes grant-serialized blocks stall multiples
    of the median.  Flags when the slowest block exceeds `ratio` x the
    median — lenient enough for tunnel jitter (observed <15%), decisive
    for real contention (r3 artifact: 3.5x)."""
    if len(block_times) < 3:
        return False
    med = sorted(block_times)[len(block_times) // 2]
    return med > 0 and max(block_times) > ratio * med


def shipping_steps_per_call() -> int:
    """TRAIN_STEPS_PER_CALL from the shipping TPU config: the production
    Trainer dispatches one scanned k-step program per host call
    (configs/tpu.json; train/trainer.py::_build_steps), so the pinned
    bench workload dispatches the same shape."""
    import os
    try:
        with open(os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "configs", "tpu.json")) as f:
            return max(1, int(json.load(f).get("TRAIN_STEPS_PER_CALL", 1)))
    except (OSError, ValueError):
        return 1


def measure(n_warmup: int = 3, n_iters: int = 50, n_blocks: int = 5,
            steps_per_call=None):
    k = shipping_steps_per_call() if steps_per_call is None \
        else max(1, int(steps_per_call))
    if k > 1:
        prog, (step, params, opt_state, src) = build_chained(k)
    else:
        step, params, opt_state, src = build_step()
        prog = step
    handles = (step, params, opt_state, src)  # single step: cost analysis
    for _ in range(n_warmup):
        params, opt_state, loss = prog(params, opt_state, src)
    assert np.isfinite(float(loss))  # device sync via scalar transfer
    # NB: sync by fetching the last loss, NOT jax.block_until_ready — the
    # latter is unreliable over tunneled backends; the loss of iteration k
    # depends on the params chain, so its transfer fences all prior steps.
    # The iterations are timed in n_blocks equal fenced blocks: the block
    # times feed the contention tripwire (VERDICT r3 item 1) at the cost
    # of one extra scalar fetch per block.
    per_block = max(1, n_iters // n_blocks)
    block_times = []
    t0 = time.perf_counter()
    for _ in range(n_blocks):
        tb = time.perf_counter()
        for _ in range(per_block):
            params, opt_state, loss = prog(params, opt_state, src)
        assert np.isfinite(float(loss))
        block_times.append(time.perf_counter() - tb)
    dt = time.perf_counter() - t0
    mps = BATCH * n_blocks * per_block * k / dt
    return mps, handles, block_times


def sweep():
    """Per-family perf table: throughput, step time, truthful TFLOP/s and
    MFU for every model family (PARITY.md perf section; VERDICT r2 items
    2/3).  Families run sequentially in one process — build_step reloads
    default.json each time, so the hparams singleton resets per row."""
    global ENCODER, MODEL
    fams = [("danet", "bilstm-orig"), ("danet", "lstm-orig"),
            ("danet", "conv-bilstm-v1"), ("danet", "gru-v1"),
            ("danet", "attn-v1"), ("danet", "moe-v1"),
            ("danet", "tcn-v1"), ("danet", "dprnn-v1"),
            ("tasnet-v1", "bilstm-orig")]
    print("%-22s %12s %9s %10s %7s" % (
        "family", "mixtures/s", "ms/step", "TFLOP/s", "MFU%"), flush=True)
    saved = (MODEL, ENCODER)  # restore after the sweep (ADVICE r3):
    # --sweep combined with other flags, or importing bench as a module,
    # must not leave the last family's globals behind
    try:
        for model, enc in fams:
            MODEL, ENCODER = model, enc
            mps, handles, _ = measure()
            tflops, mfu = mfu_stats(*handles, mix_per_sec=mps)
            name = model if model != "danet" else enc
            print("%-22s %12.0f %9.2f %10s %7s" % (
                name, mps, 1e3 * BATCH / mps,
                "-" if tflops is None else "%.1f" % tflops,
                "-" if mfu is None else "%.1f" % mfu), flush=True)
    finally:
        MODEL, ENCODER = saved


def _arg(name: str):
    """CLI value for --name, accepting both '--name v' and '--name=v'
    (ADVICE r4: the '=' forms previously slipped past the flag guard)."""
    for i, a in enumerate(sys.argv):
        if a == name:
            return sys.argv[i + 1]
        if a.startswith(name + "="):
            return a[len(name) + 1:]
    return None


def main():
    global FORCE_BACKEND, ENCODER, MODEL, BATCH, CONFIG_OVERRIDES, T
    if _arg("--encoder") is not None:
        ENCODER = _arg("--encoder")
    if _arg("--model") is not None:
        MODEL = _arg("--model")
    if _arg("--batch") is not None:
        # batch-scaling probe (VERDICT r2 item 3): the B=32 recurrent
        # step is latency-bound; larger B fills the MXU's 128 rows
        BATCH = int(_arg("--batch"))
    if _arg("--seqlen") is not None:
        # sequence-length probe (VERDICT r4 item 7): more frames per
        # dispatch = more MXU work per fixed overhead; at T>=256 the
        # 'auto' attention backend also engages the flash kernel
        T = int(_arg("--seqlen"))
    for kv in (a for i, a in enumerate(sys.argv)
               if i and sys.argv[i - 1] == "--set"):
        # generic hparam override for perf probes, e.g.
        # --set ATTN_BACKEND=flash (strings bare, numbers parsed)
        k, _, v = kv.partition("=")
        try:
            v = json.loads(v)
        except ValueError:
            pass
        CONFIG_OVERRIDES = dict(CONFIG_OVERRIDES or {}, **{k: v})
    if _arg("--chain") is not None:
        # dispatch-free device throughput probe: N steps per dispatch
        n_chain = int(_arg("--chain"))
        mps = measure_chained(n_chain)
        print("chained x%d: %.0f mixtures/sec (%.3f ms/step on-device)"
              % (n_chain, mps, 1e3 * BATCH / mps))
        return
    if "--sweep" in sys.argv:
        sweep()
        return
    if "--cpu-baseline" in sys.argv:
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        # k=1 on CPU: dispatch overhead is negligible off the tunnel, so
        # the baseline is k-invariant and stays comparable across rounds
        mps, _, _ = measure(n_warmup=1, n_iters=3, n_blocks=3,
                            steps_per_call=1)
        print("CPU baseline: %.2f mixtures/sec" % mps)
        return
    # pre-flight contention handling: another live TPU process of this
    # repo serializes the single tunnel grant.  Wait (bounded) for it to
    # drain — a clean number beats a flagged one — then record any
    # still-live rival rather than print a silently bad number (the
    # BENCH_r03 contamination, VERDICT r3 item 1; the wait is r4 item 1b)
    waited = 0.0
    if "--no-wait" in sys.argv:
        rivals = other_tpu_processes()
        if rivals:
            sys.stderr.write("[bench] WARNING: concurrent TPU-using "
                             "process(es) detected:\n  %s\n"
                             % "\n  ".join(rivals))
    else:
        rivals, waited = wait_for_rivals()
    try:
        mps, handles, block_times = measure()
    except Exception:
        # Pallas/Mosaic may not support every TPU generation; fall back to
        # the portable XLA scan — but only when the Pallas path was
        # actually selected, and always surface the original traceback so
        # real kernel bugs are not silently hidden.
        import traceback
        import jax
        from danet_tpu.ops.rnn import lstm_backend_default
        traceback.print_exc()
        if FORCE_BACKEND == "xla" or lstm_backend_default() != "pallas":
            raise
        sys.stderr.write(
            "pallas path failed on backend %r; retrying with the XLA "
            "scan backend\n" % jax.default_backend())
        FORCE_BACKEND = "xla"
        mps, handles, block_times = measure()
    record = {
        "metric": "train_mixtures_per_sec",
        "value": round(mps, 2),
        "unit": "mixtures/sec/chip",
        "vs_baseline": round(mps / CPU_BASELINE_MIX_PER_SEC, 2),
        "steps_per_call": shipping_steps_per_call(),
    }
    if waited:
        record["waited_for_rivals_secs"] = round(waited, 1)
    if rivals or contention_from_blocks(block_times):
        record["contended"] = True
        record["contention_reason"] = (
            "concurrent TPU process" if rivals
            else "block-time variance %.2fx median"
            % (max(block_times) / sorted(block_times)[len(block_times) // 2]))
    tflops, mfu = mfu_stats(*handles, mix_per_sec=mps)
    if tflops is not None:
        record["tflops_per_sec"] = tflops
        if mfu is not None:
            record["mfu_pct_bf16_peak"] = mfu
    # The headline metric stays pinned to the r1 bilstm-orig workload so
    # BENCH_r{N}.json values compare across rounds — but the SHIPPING
    # flagship is the FULL configs/tpu.json program (attn-v1 at the
    # config's own BATCH_SIZE + aux losses since r5 — ADVICE r4: the arm
    # previously adopted only ENCODER_TYPE), so a default run also
    # measures it and embeds the result in the same record.
    if not any(_arg(f) is not None for f in (
            "--encoder", "--model", "--batch", "--seqlen", "--set")):
        # best-effort: a failure here (missing config, encoder build/
        # compile error on an unsupported chip) must not discard the
        # already-measured headline record
        saved = (MODEL, ENCODER, BATCH, CONFIG_OVERRIDES)
        try:
            import os
            with open(os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "configs", "tpu.json")) as f:
                cfg = json.load(f)
            MODEL = "danet"
            ENCODER = cfg.get("ENCODER_TYPE", ENCODER)
            BATCH = int(cfg.get("BATCH_SIZE", BATCH))
            CONFIG_OVERRIDES = cfg
            if (ENCODER, BATCH) != (saved[1], saved[2]) or any(
                    k not in _NON_STEP_KEYS for k in cfg):
                mps2, handles2, bt2 = measure()
                ship = {"encoder": ENCODER, "batch": BATCH,
                        "mixtures_per_sec": round(mps2, 2),
                        "not_applied": sorted(
                            k for k in cfg if k in _NON_STEP_KEYS)}
                t2, m2 = mfu_stats(*handles2, mix_per_sec=mps2)
                if t2 is not None:
                    ship["tflops_per_sec"] = t2
                    if m2 is not None:
                        ship["mfu_pct_bf16_peak"] = m2
                if contention_from_blocks(bt2):
                    ship["contended"] = True
                record["shipping_flagship"] = ship
                # the quality recipes' stage-A/B program (no aux loss
                # yet) is equally shipped semantics and the cross-round
                # comparable point (r4's 13,583 B=64 headline was this
                # program) — embed it alongside the full-recipe number
                # so the artifact carries both protocols explicitly
                if float(cfg.get("ANCHOR_AUX_LOSS", 0) or 0) > 0:
                    CONFIG_OVERRIDES = dict(cfg, ANCHOR_AUX_LOSS=0)
                    mps3, handles3, bt3 = measure()
                    ab = {"mixtures_per_sec": round(mps3, 2)}
                    t3, m3 = mfu_stats(*handles3, mix_per_sec=mps3)
                    if t3 is not None:
                        ab["tflops_per_sec"] = t3
                        if m3 is not None:
                            ab["mfu_pct_bf16_peak"] = m3
                    if contention_from_blocks(bt3):
                        ab["contended"] = True
                    ship["stage_ab_program"] = ab
        except Exception as e:
            sys.stderr.write("[bench] shipping-flagship measurement "
                             "failed (%s: %s) — headline record kept\n"
                             % (type(e).__name__, e))
        finally:
            MODEL, ENCODER, BATCH, CONFIG_OVERRIDES = saved
    print(json.dumps(record))


if __name__ == "__main__":
    main()
