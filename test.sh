#!/bin/bash
# Eval-only smoke run (reference test.sh equivalent).
python train_net.py --config-file configs/R50_ovis_360.yaml --eval-only "$@"
