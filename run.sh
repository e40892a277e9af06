#!/bin/bash
# Train R50 on OVIS (reference run.sh equivalent; data parallelism comes from the
# device mesh — all local TPU chips are used automatically).
python train_net.py --config-file configs/R50_ovis_360.yaml "$@"
