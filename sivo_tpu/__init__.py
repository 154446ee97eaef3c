"""sivo_tpu — a TPU-native stereo semantic visual SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of SIVO
(Semantically Informed Visual Odometry and Mapping; reference C++ at
/root/reference): a Bayesian SegNet semantic front end with MC-dropout
uncertainty, an ORB stereo feature pipeline, information-theoretic
(mutual-information minus classification-entropy) feature selection,
and an ORB-SLAM2-style tracking / local-mapping / loop-closing back end
with batched Levenberg-Marquardt bundle adjustment.

Design stance (TPU-first, not a port):
  * functional core: every hot stage is a jitted, fixed-shape, masked
    computation (frames, keypoints, map windows are padded SoA arrays);
  * thin async shell: a host orchestrator owns the map state and
    dispatches device programs, replacing the reference's 4-thread
    mutex web;
  * MC-dropout samples, RANSAC hypotheses and BA point blocks are the
    natural mesh axes for multi-chip sharding (jax.sharding + shard_map).
"""

__version__ = "0.1.0"

from sivo_tpu import config as config  # noqa: F401
