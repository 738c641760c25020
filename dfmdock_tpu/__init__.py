"""dfmdock_tpu — a TPU-native (JAX/XLA/Pallas/pjit) protein–protein docking framework.

A from-scratch re-design of the capabilities of Graylab/DFMDock ("Denoising Force
Matching Dock": score-based SE(3) diffusion for rigid-body docking that unifies
sampling and ranking via an energy head).  Reference behavior is documented in
/root/repo/SURVEY.md; this package is an independent, TPU-first implementation:

- the entire reverse-diffusion step (featurize -> EGNN score net -> SDE update)
  is one jitted function, `lax.scan`ned over timesteps and `vmap`ped over poses;
- ragged residue counts are handled by padding + masks (no dynamic graphs);
- stochastic edge subsampling is Gumbel-top-k under explicit PRNG keys;
- force matching (dedx = -dE/dx) is native `jax.grad`;
- multi-chip scaling is `jax.sharding.Mesh` + pjit data/pose parallelism.
"""

__version__ = "0.1.0"

# Opt-in platform override.  The build environment's sitecustomize initializes
# the axon TPU backend regardless of the JAX_PLATFORMS env var (it is reset at
# interpreter start), so the only reliable way to force CPU is the in-process
# config knob before first backend use (NOTES.md).  DFMDOCK_PLATFORM=cpu makes
# every CLI / script importing this package honor that.
import os as _os

_plat = _os.environ.get("DFMDOCK_PLATFORM")
if _plat:
    import jax as _jax

    _jax.config.update("jax_platforms", _plat)
del _os, _plat
