#!/bin/bash
# Paper training recipe (ref scripts/train_tum_rgbd.sh): feature preset,
# EPE3D loss, Adam 5e-4, 30 epochs, batch 64, keyframes 1,2,4,8
python -m deep_prob_feature_track_tpu.apps.train \
  --dataset TUM_RGBD --preset feature --loss EPE3D \
  --keyframes 1,2,4,8 --batch_size 64 --epochs 30 --lr 5e-4 --mesh "$@"
