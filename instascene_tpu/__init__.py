"""instascene_tpu — a TPU-native JAX framework for 2D Gaussian-surfel splatting
reconstruction and contrastive 3D instance decomposition.

Re-designed from scratch for TPU (JAX / XLA / Pallas) with the capabilities of
the InstaScene reference pipeline (zju3dv/InstaScene, ICCV 2025):

* geometry training of a 2D-Gaussian-surfel radiance field (train.py parity),
* semantic feature lifting with mask-clustering instance priors and
  spatial-contrastive losses (train_semantic.py parity),
* interactive feature-based instance segmentation.

Layers (see SURVEY.md):
  data/      COLMAP parsing, PLY I/O, image loading          (host, numpy)
  cameras    camera model and matrix conventions             (host + jnp)
  ops/       splatting kernels: preprocess, binning, blend   (jnp + Pallas)
  models/    Gaussian parameter pytree, optimizer, densify   (jnp/optax)
  semantic/  spatial-track mask clustering, contrastive loss (host + jnp)
  parallel/  device-mesh sharding helpers                    (jax.sharding)
  pipelines/ training loops                                  (jit-compiled)
"""

__version__ = "0.1.0"

import os as _os


def _setup_compilation_cache():
    """Enable the persistent XLA compilation cache: TPU compiles in this
    environment are expensive (remote compile service), and training/benching
    re-uses a small set of shapes across processes."""
    try:
        import jax
        cache_dir = _os.environ.get("INSTASCENE_JAX_CACHE",
                                    _os.path.expanduser("~/.cache/jax_comp"))
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_setup_compilation_cache()
