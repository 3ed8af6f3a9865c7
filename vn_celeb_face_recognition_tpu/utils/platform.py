"""Device/platform selection.

The reference CLIs take ``-dv GPU|CPU`` and map to cuda:0/cpu
(demo_image.py:354-356, base_trainer.py:52-55). Here the accelerator is
whatever JAX exposes (TPU in production); ``select_platform('CPU')``
forces the CPU backend — useful for tests, debugging, and machines
where the TPU is busy.
"""


def select_platform(device):
    if device is None:
        return
    device = str(device).lower()
    if device in ("cpu",):
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception as exc:  # backend already initialised
            print(f"Warning: could not switch platform to cpu: {exc}")
