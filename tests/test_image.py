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


def test_train_transform_batch(rng):
    imgs = jnp.asarray(rng.random((4, 256, 256, 3)), jnp.float32)
    out = I.train_transform_batch(jax.random.PRNGKey(0), imgs)
    assert out.shape == (4, 3, 224, 224)
    assert np.isfinite(np.asarray(out)).all()
    # normalized stats should be roughly standard
    assert abs(float(out.mean())) < 2.0
