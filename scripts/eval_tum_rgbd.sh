#!/bin/bash
# Paper evaluation recipe (ref scripts/eval_tum_rgbd.sh)
python -m deep_prob_feature_track_tpu.apps.evaluate \
  --dataset TUM_RGBD --preset feature --keyframes 1,2,4,8 "$@"
