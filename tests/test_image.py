"""Image preprocessing: eval-chain parity vs HF CLIPImageProcessor and
behavioral checks on the jittable train augmentations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synergy_tpu.data import image as I


@pytest.fixture(scope="module")
def clip_processor():
    from transformers import CLIPImageProcessor

    return CLIPImageProcessor(
        size={"shortest_edge": 224}, crop_size={"height": 224, "width": 224})


def test_normalize_exact():
    img = jnp.full((4, 4, 3), 0.5)
    out = I.normalize(img)
    expected = (0.5 - np.array(I.CLIP_MEAN)) / np.array(I.CLIP_STD)
    np.testing.assert_allclose(np.asarray(out[0, 0]), expected, rtol=1e-6)


def test_eval_transform_close_to_hf(clip_processor, rng):
    from PIL import Image

    for shape in [(320, 480), (480, 320), (224, 224), (250, 250)]:
        arr = (rng.random((*shape, 3)) * 255).astype(np.uint8)
        pil = Image.fromarray(arr)
        ref = clip_processor(images=pil, return_tensors="np")["pixel_values"][0]
        ours = np.asarray(I.eval_transform(jnp.asarray(arr, jnp.float32) / 255.0))
        assert ours.shape == ref.shape == (3, 224, 224)
        # PIL and XLA bicubic resamplers differ slightly; bound the error in
        # normalized units (~2/255 in pixel space).
        err = np.abs(ours - ref)
        assert np.percentile(err, 99) < 0.05, float(err.max())
        assert err.mean() < 0.01


def test_eval_transform_same_size_exact(clip_processor, rng):
    """With no resampling (224x224 input) the chain must match HF exactly."""
    from PIL import Image

    arr = (rng.random((224, 224, 3)) * 255).astype(np.uint8)
    ref = clip_processor(images=Image.fromarray(arr), return_tensors="np")
    ref = ref["pixel_values"][0]
    ours = np.asarray(I.eval_transform(jnp.asarray(arr, jnp.float32) / 255.0))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_random_resized_crop_shapes_and_determinism(rng):
    img = jnp.asarray(rng.random((224, 224, 3)), jnp.float32)
    key = jax.random.PRNGKey(0)
    a = I.random_resized_crop(key, img)
    b = I.random_resized_crop(key, img)
    assert a.shape == (224, 224, 3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = I.random_resized_crop(jax.random.PRNGKey(1), img)
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-3


def test_color_jitter_bounds(rng):
    img = jnp.asarray(rng.random((32, 32, 3)), jnp.float32)
    out = I.color_jitter(jax.random.PRNGKey(0), img)
    assert out.shape == img.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    # small jitter amplitudes -> output stays close to input
    assert float(jnp.abs(out - img).mean()) < 0.2


def test_adjust_hue_identity(rng):
    img = jnp.asarray(rng.random((16, 16, 3)), jnp.float32)
    out = I.adjust_hue(img, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


@pytest.mark.slow
def test_train_transform_batch(rng):
    imgs = jnp.asarray(rng.random((4, 256, 256, 3)), jnp.float32)
    out = I.train_transform_batch(jax.random.PRNGKey(0), imgs)
    assert out.shape == (4, 3, 224, 224)
    assert np.isfinite(np.asarray(out)).all()
    # normalized stats should be roughly standard
    assert abs(float(out.mean())) < 2.0


def test_ft_eval_transform_pinned(rng):
    """Per-dataset FT eval chain = Resize((S,S)) + Normalize(stats) in CHW
    (reference FT_image_task.py valid_transforms blocks), pinned against a
    manual composition and a golden value."""
    from synergy_tpu.data.image import ft_eval_transform, normalize, resize

    img = jnp.asarray(rng.random((17, 23, 3)), jnp.float32)
    out = ft_eval_transform(img, 32, (0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    manual = jnp.transpose(
        normalize(resize(img, (32, 32)), (0.5,) * 3, (0.5,) * 3), (2, 0, 1))
    assert out.shape == (3, 32, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(manual), atol=1e-6)
    # Normalize((0.5,)*3,(0.5,)*3) maps [0,1] -> [-1,1]
    assert float(out.min()) >= -1.0 - 1e-5 and float(out.max()) <= 1.0 + 1e-5
    golden = ft_eval_transform(jnp.full((8, 8, 3), 0.25), 8,
                               (0.5,) * 3, (0.5,) * 3)
    np.testing.assert_allclose(np.asarray(golden), -0.5, atol=1e-6)


def test_ft_train_transform_no_random_crop(rng):
    """The FT train chain has NO RandomResizedCrop: with all probabilities
    zeroed it reduces exactly to the eval chain (unlike the stage-1
    pretraining chain, which always crops)."""
    from synergy_tpu.data.image import ft_eval_transform, ft_train_transform

    img = jnp.asarray(rng.random((40, 40, 3)), jnp.float32)
    stats = ((0.507, 0.487, 0.441), (0.267, 0.256, 0.276))
    out = ft_train_transform(jax.random.PRNGKey(3), img, 32, *stats,
                             flip_h_p=0.0, flip_v_p=0.0,
                             jitter=0.05, jitter_p=0.0)
    ref = ft_eval_transform(img, 32, *stats)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    # and with probabilities on, the output is still a valid normalized image
    out2 = ft_train_transform(jax.random.PRNGKey(4), img, 32, *stats)
    assert out2.shape == (3, 32, 32) and np.isfinite(np.asarray(out2)).all()


def test_ft_chain_table_matches_reference():
    """Pin the per-dataset constants to the reference transform blocks
    (FT_image_task.py:134-288), incl. the Pets train-CLIP/eval-ImageNet
    quirk."""
    from synergy_tpu.data.image import (
        CLIP_MEAN, CLIP_STD, IMAGENET_MEAN, IMAGENET_STD,
    )
    from synergy_tpu.eval.ft_image import FT_CHAINS

    assert set(FT_CHAINS) == {"cifar-10", "cifar-100", "pets", "flowers",
                              "imagenet"}
    for d in ("cifar-10", "cifar-100"):
        c = FT_CHAINS[d]
        assert c["train_stats"] == c["eval_stats"] == ((0.5,) * 3, (0.5,) * 3)
        assert (c["flip_h_p"], c["flip_v_p"]) == (0.5, 0.15)
        assert (c["jitter"], c["jitter_p"]) == (0.075, 0.5)
    f = FT_CHAINS["flowers"]
    assert f["train_stats"] == ((0.507, 0.487, 0.441), (0.267, 0.256, 0.276))
    assert (f["flip_h_p"], f["flip_v_p"], f["jitter"], f["jitter_p"]) == \
        (0.25, 0.05, 0.05, 0.25)
    p = FT_CHAINS["pets"]
    assert p["train_stats"] == (CLIP_MEAN, CLIP_STD)
    assert p["eval_stats"] == (IMAGENET_MEAN, IMAGENET_STD)
    i = FT_CHAINS["imagenet"]
    assert i["train_stats"] == (IMAGENET_MEAN, IMAGENET_STD)
    assert (i["jitter"], i["jitter_p"]) == (0.05, 0.33)
