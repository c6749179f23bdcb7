#!/bin/bash
# Keyframe VO demo (ref scripts/run_kf_vo.sh)
python -m deep_prob_feature_track_tpu.apps.kf_vo --vo feature --vo_type keyframe "$@"
