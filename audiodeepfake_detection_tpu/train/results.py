"""Result aggregation and LaTeX table emission.

Parity target: reference ``print_results``
(src/audiofakedetect/train_classifier.py:1371-1446) — per-config LaTeX rows
``max acc / mean±std acc / min EER / mean±std EER``, saved results tensor of
shape (seeds, configs, 4), "Best unknown eer" and best-config selection —
plus the paper-table helper (src/audiofakedetect/utils.py:412-479).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..utils.config import DotDict, Griderator


def print_results(
    args: DotDict,
    exp_results: Dict,
    griderator: Optional[Griderator],
    model_file: str = "defaultmodel",
) -> Optional[dict]:
    """Aggregate per-seed results, emit LaTeX rows, pick the best config."""
    results = np.asarray(list(exp_results.values()), dtype=np.float64)
    if results.shape[0] == 0:
        return None
    if results.ndim == 2:
        results = results[:, None, :]

    if args.transform == "packets":
        if griderator is not None and "wavelet" in griderator.init_config:
            wavelets = griderator.init_config["wavelet"]
        elif args.wavelet is not None:
            wavelets = [args.wavelet]
        else:
            wavelets = ["default"]
    else:
        wavelets = ["stft"]

    if args.log_dir:
        np.save(
            args.log_dir
            + f"/{model_file.split('/')[-1]}_{','.join(map(str, wavelets))}_results.npy",
            results,
        )
    mean = results.mean(0)
    std = results.std(0)
    print("results:", results)
    print(mean)
    print(std)

    print("evaluating results:")
    mins = results.min(0)
    maxs = results.max(0)
    rows = []
    configs = []
    for i in range(len(mean)):
        print("------------------------------------------------------------------")
        if griderator is not None:
            configs.append(
                dict(zip(griderator.get_keys(), griderator.grid_values[i]))
            )
        row = (
            rf"& ${maxs[i, 2] * 100:.2f}$ & ${mean[i, 2] * 100:.2f} \pm "
            rf"{std[i, 2] * 100:.2f}$ &"
            rf" ${mins[i, 3]:.3f}$ & ${mean[i, 3]:.3f} \pm {std[i, 3]:.3f}$ \\"
        )
        rows.append(row)
    rows_arr = np.asarray(rows, dtype=object)
    print(rows_arr)
    if griderator is not None and "cross_sources" in griderator.init_config:
        cross_dirs = griderator.init_config["cross_sources"]
        if len(rows_arr) == len(wavelets) * len(cross_dirs):
            table = rows_arr.reshape((len(wavelets), len(cross_dirs)))
            for i in range(len(cross_dirs)):
                print("+---------------------+")
                print(cross_dirs[i])
                for k in range(len(wavelets)):
                    print(rf"{wavelets[k]} & {table[k][i]}")
            print("+---------------------+")
    print("------------------------------------------------------------------")
    best = int(np.argmin(mean[:, 3]))
    print(
        f"Best unknown eer: {mean[best, 3]:.4f} +- {std[best, 3]:.4f}"
    )
    best_config = None
    if args.enable_gs and griderator is not None:
        best_config = dict(zip(griderator.get_keys(), griderator.grid_values[best]))
        print(f"Best config: {best_config}")
    return best_config


def print_paper_tables(res_eer: np.ndarray, res_acc: np.ndarray) -> dict:
    """WaveFake / avocodo / bigvgan aggregate rows (reference utils.py:412-479).

    ``res_eer``/``res_acc`` are (num_cross_dirs, seeds) arrays in the
    reference's fixed cross-source order.
    """
    wf_idx = [0, 1, 2, 3, 4, 5, 9, 10, 11]
    wavefake_acc = np.stack([res_acc[i] for i in wf_idx]).mean(0)
    wavefake_eer = np.stack([res_eer[i] for i in wf_idx])
    out = {
        "all": (
            f"&${round(res_acc.mean(0).max() * 100, 2)}$ & "
            rf"${round(res_acc.mean() * 100, 2)} \pm "
            rf"{round(res_acc.mean(0).std() * 100, 2)}$ &"
            f"${round(res_eer.mean(0).min(), 3)}$ & "
            rf"${round(res_eer.mean(), 3)} \pm {round(res_eer.mean(0).std(), 3)}$ "
        ),
        "wavefake": (
            f"&${round(wavefake_acc.max() * 100, 2)}$ & "
            rf"${round(wavefake_acc.mean() * 100, 2)} \pm "
            rf"{round(wavefake_acc.std() * 100, 2)}$ &"
            f"${round(wavefake_eer.mean(0).min(), 3)}$ & "
            rf"${round(wavefake_eer.mean(), 3)} \pm "
            rf"{round(wavefake_eer.mean(0).std(), 3)}$ "
        ),
    }
    avocodo_acc, avocodo_eer = res_acc[8], res_eer[8]
    bigvgan_acc = np.stack([res_acc[6], res_acc[7]]).mean(0)
    bigvgan_eer = np.stack([res_eer[6], res_eer[7]]).mean(0)
    out["avbigvgan"] = (
        f"&${round(avocodo_acc.max() * 100, 2)}$ & "
        rf"${round(avocodo_acc.mean() * 100, 2)} \pm "
        rf"{round(avocodo_acc.std() * 100, 2)}$ &"
        f"${round(avocodo_eer.min(), 3)}$ & "
        rf"${round(avocodo_eer.mean(), 3)} \pm {round(avocodo_eer.std(), 3)}$ "
        "& "
        f"${round(bigvgan_acc.max() * 100, 2)}$ & "
        rf"${round(bigvgan_acc.mean() * 100, 2)} \pm "
        rf"{round(bigvgan_acc.std() * 100, 2)}$ &"
        f"${round(bigvgan_eer.min(), 3)}$ & "
        rf"${round(bigvgan_eer.mean(), 3)} \pm {round(bigvgan_eer.std(), 3)}$ "
    )
    for key in ("all", "wavefake", "avbigvgan"):
        print(key)
        print(out[key])
    return out
