#!/bin/bash
# feature+ICP evaluation (ref scripts/eval_tum_feature_icp.sh)
python -m deep_prob_feature_track_tpu.apps.evaluate \
  --dataset TUM_RGBD --preset feature_icp --keyframes 1,2,4,8 "$@"
