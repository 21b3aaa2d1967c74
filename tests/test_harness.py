import os, jax
def test_probe():
    assert os.environ.get("JAX_PLATFORMS") == "cpu", os.environ.get("JAX_PLATFORMS")
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert jax.device_count() == 8, jax.device_count()
