#!/bin/bash
# Retrain the TD3 weight policy across the 5 scene families (now
# including drifting_lidar, the family where weighting provably helps
# end to end) and swap the shipped artifact ONLY if the candidate passes
# every policy gate the old one passes.
set -e
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo
PY=/opt/venv/bin/python

$PY -m lvio_fusion_tpu.cli train-rl --multi-scene --imu --lidar \
    --frames 40 --envs 8 --epochs 6 --steps 40 \
    --weight-reg 0.3 --anchor 5.0 --out misc/td3_policy_r07.pkl

# evaluate the candidate through the same gates as the shipped artifact
cp misc/td3_policy.pkl misc/td3_policy_prev.pkl
cp misc/td3_policy_r07.pkl misc/td3_policy.pkl
if $PY -m pytest tests/test_policy_artifact.py -q; then
    echo "candidate passes all policy gates — shipped artifact updated"
    rm -f misc/td3_policy_prev.pkl
else
    echo "candidate FAILED a gate — restoring previous artifact"
    mv misc/td3_policy_prev.pkl misc/td3_policy.pkl
    exit 1
fi
