"""deep_prob_feature_track_tpu: TPU-native deep probabilistic feature-metric tracking.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``smartroboticslab/deep_prob_feature_track`` ("Deep Probabilistic
Feature-metric Tracking", Xu, Davison, Leutenegger, RA-L 2021): ConvNet
feature/uncertainty pyramids, trust-region inverse-compositional
Gauss-Newton pose solvers, learned M-estimator / damping / scale networks,
keyframe visual odometry, feature+ICP joint refinement — built TPU-first
(functional core, static shapes, MXU-shaped reductions, mesh-sharded
training) rather than as a port.
"""

__version__ = "0.1.0"
