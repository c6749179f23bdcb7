#!/bin/bash
# Object-motion training on MovingObjects3D (ref scripts/train_object*.sh)
python -m deep_prob_feature_track_tpu.apps.train \
  --dataset MovingObjects3D --preset feature --loss EPE3D \
  --keyframes 1,2,4 --batch_size 64 --epochs 30 --lr 5e-4 --mesh "$@"
