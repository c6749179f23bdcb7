#!/bin/bash
# Convergence-basin study (ref scripts/run_kf_vo_cb.sh)
python -m deep_prob_feature_track_tpu.apps.convergence_basin --preset feature "$@"
