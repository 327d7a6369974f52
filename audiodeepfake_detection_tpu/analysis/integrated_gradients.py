"""Integrated-gradients attribution, vmapped over the interpolation path.

Parity target: the reference's TF-tutorial port
(reference: src/audiofakedetect/integrated_gradients.py:13-138 and
train_classifier.py:576-844): alphas in ``linspace(0, 1, m_steps+1)``,
gradients of ``softmax(logits)[target]`` w.r.t. the interpolated images,
trapezoid integral, scaled by ``image - baseline``; running means over up to
2500 samples per target saved as ``.npy``.

The reference runs 201 separate forward+backward passes per sample; here the
whole alpha batch is one ``vmap``-ed ``jax.grad`` inside a single jit —
orders of magnitude fewer dispatches on TPU.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class Mean:
    """Running mean accumulator (reference integrated_gradients.py:13-47).

    API-parity port, NOT used by the production IG path (which accumulates
    sums directly on device, see ``attribute_dataset`` below).  Contract
    inherited from the reference: ``finalize`` averages over axis 0 *and*
    divides by the update count, so it returns the per-sample mean only when
    every ``update`` receives a ``[1, ...]`` singleton-batch tensor — exactly
    how the reference trainer feeds it (train_classifier.py:694-844).  Feeding
    multi-row batches averages over the rows a second time; don't.
    """

    def __init__(self) -> None:
        self.count = 0
        self.mean: Optional[np.ndarray] = None

    def update(self, batch_vals: np.ndarray) -> None:
        batch_vals = np.asarray(batch_vals)
        if self.mean is None:
            self.mean = np.zeros_like(batch_vals, dtype=np.float32)
        self.count += 1
        self.mean += batch_vals

    def finalize(self) -> np.ndarray:
        assert self.mean is not None
        return np.mean(self.mean, axis=0).squeeze() / self.count


def interpolate_images(
    baseline: jnp.ndarray, image: jnp.ndarray, alphas: jnp.ndarray
) -> jnp.ndarray:
    """Linear interpolation along the attribution path."""
    a = alphas.reshape(-1, *([1] * image.ndim))
    return baseline[None] + a * (image[None] - baseline[None])


def integral_approximation(gradients: jnp.ndarray) -> jnp.ndarray:
    """Riemann trapezoid over the alpha axis."""
    grads = (gradients[:-1] + gradients[1:]) / 2.0
    return jnp.mean(grads, axis=0)


@functools.partial(jax.jit, static_argnames=("apply_fn", "m_steps"))
def integrated_grad(
    apply_fn,
    variables,
    image: jnp.ndarray,
    target_class_idx: jnp.ndarray,
    m_steps: int = 200,
) -> jnp.ndarray:
    """Integrated gradients for one image ``[C, F, T]``."""
    baseline = jnp.zeros_like(image)
    alphas = jnp.linspace(0.0, 1.0, m_steps + 1)
    path = interpolate_images(baseline, image, alphas)

    def prob(img):
        logits = apply_fn(variables, img[None], train=False)[0]
        return jax.nn.softmax(logits, axis=-1)[target_class_idx]

    grads = jax.vmap(jax.grad(prob))(path)
    avg = integral_approximation(grads)
    return (image - baseline) * avg


def run_integrated_gradients(
    trainer,
    model_file: str = "ig",
    times_per_target: Optional[int] = None,
) -> None:
    """Accumulate mean attributions over the cross test set and save ``.npy``.

    Mirrors the reference's target bookkeeping
    (train_classifier.py:678-844): with ``args.target`` unset both classes
    are accumulated up to ``times`` samples each.
    """
    args = trainer.args
    plot_path = args.log_dir + "/plots/"
    os.makedirs(plot_path, exist_ok=True)
    if trainer.cross_loader_test is None:
        raise RuntimeError(
            "integrated gradients need the cross test set — pass "
            "--cross-data-path (cross_loader_test is None)."
        )

    both = args.target is None
    try:
        target_value = int(args.target) if args.target is not None else 1
    except ValueError:
        target_value = 1
    times = times_per_target or args.ig_times_per_target or 2500
    index = index_0 = index_1 = 0
    m_steps = 200

    apply_fn = trainer.model.apply
    variables = {
        "params": trainer.state.params,
        "batch_stats": trainer.state.batch_stats,
    }

    # accumulate ON DEVICE: a per-sample np.asarray would pay the ~85 ms
    # host<->device RTT for each of up to 2*times samples (CLAUDE.md:
    # never fetch per step); one fetch happens after the loop
    from ..train.steps import audio_to_float

    ig_sum = sal_sum = last_image = None

    def eligible(c_label: int) -> bool:
        if not both:
            return c_label == target_value and index < times
        if c_label == 0:
            return index_0 < times
        return index_1 < times

    for batch in trainer.cross_loader_test.epoch(0, shuffle=False):
        labels = (np.asarray(batch["label"]) != 0).astype(np.int64)
        weight = np.asarray(batch.get("weight", np.ones(len(labels))))
        wanted = [
            i
            for i in range(len(labels))
            if weight[i] != 0 and eligible(int(labels[i]))
        ]
        if not wanted:  # skip the device transform for all-skipped batches
            if both and index_0 >= times and index_1 >= times:
                break
            if not both and index >= times:
                break
            continue
        # int16 PCM batches (frame-cache emit mode) convert on device,
        # exactly like every trainer path (train/steps.py audio_to_float)
        images = trainer.transform(audio_to_float(jnp.asarray(batch["audio"])))
        for i in wanted:
            c_label = int(labels[i])
            if not eligible(c_label):  # quota may fill mid-batch
                continue
            attributions = integrated_grad(
                apply_fn,
                variables,
                images[i],
                jnp.asarray(c_label),
                m_steps=m_steps,
            )
            mask = jnp.sum(attributions, axis=0)[None]
            ig_sum = mask if ig_sum is None else ig_sum + mask
            sal_sum = images[i] if sal_sum is None else sal_sum + images[i]
            last_image = images[i]
            if c_label == 0:
                index_0 += 1
            else:
                index_1 += 1
            index += 1
        if both and index_0 >= times and index_1 >= times:
            break
        if not both and index >= times:
            break

    print("index 0 ", index_0)
    print("index 1 ", index_1)
    print("index ", index)
    if ig_sum is None:
        print("no samples matched the attribution targets")
        return
    mean_ig = np.mean(np.asarray(ig_sum), axis=0).squeeze() / index
    mean_sal = np.mean(np.asarray(sal_sum), axis=0).squeeze() / index

    # multi-host: every process accumulates over ITS loader shard (the
    # reference does the same per rank, train_classifier.py:678-844) and
    # only the lead writes — concurrent saves to one path would tear
    if jax.process_index() != 0:
        return
    target_str = "01" if both else str(target_value)
    path = (
        plot_path
        + model_file.replace("/", "_")
        + "_"
        + "-".join(args.cross_sources)
        + f"x{times}_target-{target_str}"
    )
    np.save(path + "_integrated_gradients.npy", mean_ig)
    np.save(path + "_mean_images.npy", np.squeeze(mean_sal))
    np.save(path + "_last_image.npy", np.squeeze(np.asarray(last_image)))
