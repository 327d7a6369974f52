"""The corpus acceptance gate, as ONE asserting command.

The north-star acceptance criterion (BASELINE.md: EER/accuracy within
±0.5% of the PyTorch reference on LJSpeech-vs-fbmelgan) cannot run in the
build image — the corpus is not shipped (zero egress).  This tool wraps
the staged procedure so the FIRST session with data lands the gate in one
command::

    python tools/parity_gate.py --data-path ./data/fake \
        [--save-path ./data/parity_run] [--tags stft packetssym5 packetscoif4] \
        [--skip-retrain] [--report parity_gate.json]

Per bundled checkpoint (reference ``models/model_*.pt``):

1. **Import + only-testing** — copy the bundled snapshot into a fresh log
   dir under its byte-identical reproduced filename, run the driver in
   ``--only-testing`` mode over the prepared dataset, record test acc/EER
   (reference eval chain: train_classifier.py:965-969, 1028).
2. **Retrain seed 0** — the exact bundled config (configs/parity_run.py
   values, name scheme train_classifier.py:1221-1269), 10 epochs.
3. **Assert** ``|acc_retrain - acc_import| <= 0.5%`` and
   ``|eer_retrain - eer_import| <= 0.005`` — the reproducibility anchor
   the bundled checkpoints exist for.

Exit codes: 0 = gate passed; 1 = gate FAILED (deltas above tolerance);
2 = prerequisites missing (no corpus / no bundled checkpoints).  A JSON
report with every measured number is always written.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_MODELS = "/root/reference/models"
ACC_TOL = 0.005  # ±0.5% absolute accuracy
EER_TOL = 0.005

TAG_CONFIG = {
    "stft": {"transform": "stft", "wavelet": "sym5"},
    "packetssym5": {"transform": "packets", "wavelet": "sym5"},
    "packetscoif4": {"transform": "packets", "wavelet": "coif4"},
}


def bundled_args(data_path: str, save_path: str, log_dir: str, tag: str):
    """The exact config the bundled checkpoints were trained with
    (configs/parity_run.py; filename scheme utils/naming.py)."""
    from audiodeepfake_detection_tpu.utils.config import default_config

    a = default_config()
    a.update(
        transform=TAG_CONFIG[tag]["transform"],
        wavelet=TAG_CONFIG[tag]["wavelet"],
        features="none",
        hop_length=220,
        sample_rate=22050,
        window_size=22050,
        num_of_scales=256,
        f_min=1.0,
        f_max=11025.0,
        learning_rate=0.0004,
        weight_decay=0.001,
        batch_size=128,
        nclasses=2,
        epochs=10,
        model="modules",
        module="DCNN",
        kernel1=3,
        ochannels1=64,
        ochannels2=64,
        ochannels3=96,
        ochannels4=128,
        ochannels5=32,
        flattend_size=320,
        time_dim_add=1,
        loss_less="False",
        aug_contrast=False,
        aug_noise=False,
        power=2.0,
        log_scale=True,
        calc_normalization=True,
        seconds=1,
        dropout_cnn=0.6,
        dropout_lstm=0.2,
        validation_interval=2,
        ckpt_every=2,
        data_path=data_path,
        data_prefix=os.path.join(data_path, "model_22050_22050_0.7_fbmelgan"),
        save_path=save_path,
        only_use=["ljspeech", "fbmelgan"],
        limit_train=(55504, 7504, 15504),
        cross_data_path=None,
        get_details=False,
        seed=0,
        log_dir=log_dir,
        frame_cache=True,
    )
    return a


def stage_bundled_snapshot(args, tag: str) -> str:
    """Copy the bundled .pt into the run's models dir under the reproduced
    (byte-identical) filename; returns the staged path."""
    from audiodeepfake_detection_tpu.utils.naming import experiment_model_file

    src = sorted(glob.glob(f"{REFERENCE_MODELS}/model_{tag}_*.pt"))
    if not src:
        raise FileNotFoundError(f"no bundled checkpoint for tag {tag}")
    dst = experiment_model_file(args, args.log_dir, "DCNN") + ".pt"
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    if os.path.basename(dst) != os.path.basename(src[0]):
        raise AssertionError(
            "reproduced snapshot filename does not match the bundled one:\n"
            f"  reproduced: {os.path.basename(dst)}\n"
            f"  bundled:    {os.path.basename(src[0])}"
        )
    shutil.copy(src[0], dst)
    return dst


def run_tag(tag: str, data_path: str, save_path: str, work: str,
            skip_retrain: bool) -> dict:
    from audiodeepfake_detection_tpu.train.experiment import run_experiment

    out: dict = {"tag": tag}

    # -- stage 1: imported checkpoint, only-testing ------------------------
    log_import = os.path.join(work, f"{tag}_import")
    os.makedirs(os.path.join(log_import, "models"), exist_ok=True)
    os.makedirs(os.path.join(log_import, "norms"), exist_ok=True)
    a = bundled_args(data_path, save_path, log_import, tag)
    stage_bundled_snapshot(a, tag)
    a.only_testing = True
    trainer = run_experiment(a)
    acc_i, eer_i = float(trainer.test_results[0]), float(trainer.test_results[1])
    out["import"] = {"acc": acc_i, "eer": eer_i}
    print(f"[{tag}] imported checkpoint: acc {acc_i:.4f}, eer {eer_i:.4f}")

    if skip_retrain:
        out["retrain"] = None
        out["pass"] = None
        return out

    # -- stage 2: retrain seed 0 -------------------------------------------
    log_retrain = os.path.join(work, f"{tag}_retrain")
    os.makedirs(os.path.join(log_retrain, "models"), exist_ok=True)
    os.makedirs(os.path.join(log_retrain, "norms"), exist_ok=True)
    a2 = bundled_args(data_path, save_path, log_retrain, tag)
    trainer2 = run_experiment(a2)
    acc_r, eer_r = float(trainer2.test_results[0]), float(trainer2.test_results[1])
    out["retrain"] = {"acc": acc_r, "eer": eer_r}
    print(f"[{tag}] retrained seed 0:   acc {acc_r:.4f}, eer {eer_r:.4f}")

    # -- stage 3: assert ----------------------------------------------------
    d_acc, d_eer = abs(acc_r - acc_i), abs(eer_r - eer_i)
    out["delta"] = {"acc": d_acc, "eer": d_eer}
    out["pass"] = bool(d_acc <= ACC_TOL and d_eer <= EER_TOL)
    status = "PASS" if out["pass"] else "FAIL"
    print(f"[{tag}] {status}: |dacc| {d_acc:.4f} (tol {ACC_TOL}), "
          f"|deer| {d_eer:.4f} (tol {EER_TOL})")
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--data-path", default="./data/fake")
    p.add_argument("--save-path", default="./data/parity_run")
    p.add_argument("--work-dir", default="./parity_gate_runs")
    p.add_argument(
        "--tags", nargs="+", default=["stft", "packetssym5", "packetscoif4"],
        choices=sorted(TAG_CONFIG),
    )
    p.add_argument("--skip-retrain", action="store_true",
                   help="stage 1 only: eval the imported checkpoints")
    p.add_argument("--report", default="parity_gate.json")
    args = p.parse_args(argv)

    if not os.path.isdir(args.data_path) or not any(
        e.name.startswith(("A_", "B_")) or "ljspeech" in e.name
        for e in os.scandir(args.data_path)
    ):
        print(f"prerequisite missing: no prepared corpus at {args.data_path} "
              "(run data/prepare.py first; see configs/parity_run.py)")
        return 2
    if not glob.glob(f"{REFERENCE_MODELS}/model_*.pt"):
        print(f"prerequisite missing: no bundled checkpoints under "
              f"{REFERENCE_MODELS}")
        return 2

    results = [
        run_tag(t, args.data_path, args.save_path, args.work_dir,
                args.skip_retrain)
        for t in args.tags
    ]
    verdicts = [r["pass"] for r in results if r["pass"] is not None]
    gate = {"results": results,
            "gate_pass": bool(verdicts) and all(verdicts),
            "acc_tol": ACC_TOL, "eer_tol": EER_TOL}
    with open(args.report, "w") as fh:
        json.dump(gate, fh, indent=2)
    print(f"report: {args.report}")
    if not verdicts:
        print("gate: import-only run (no retrain verdict)")
        return 0
    print(f"gate: {'PASS' if gate['gate_pass'] else 'FAIL'}")
    return 0 if gate["gate_pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
