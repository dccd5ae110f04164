#!/usr/bin/env bash
# TMI paper evaluation recipes — TPU port of the reference's
# tmi_scripts/test.sh. `train=False` auto-loads the best checkpoint saved by
# train.sh for the same seed/task (runner.py resolves outputs/<seed>/<name>).
# Usage: bash tmi_scripts/test.sh [dataset]   (default: camus)
set -e
SEED=1
dataset=${1:-camus}
TAG=TMI_FINAL_TEST

############### DSNT-AL ################

python runner.py train=False seed=${SEED} data=${dataset}-cont ++comet_tags=[${dataset},${TAG},${SEED}] task=dsnt-al
python runner.py train=False seed=${SEED} data=${dataset}-cont ++comet_tags=[${dataset},${TAG},${SEED}] task=dsnt-al task.sequence_sampler=True

python runner.py train=False seed=${SEED} data=${dataset}-cont ++comet_tags=[${dataset},${TAG},${SEED}] task=dsnt-al task.model.drop_block=True task.t_e=10
python runner.py train=False seed=${SEED} data=${dataset}-cont ++comet_tags=[${dataset},${TAG},${SEED}] task=dsnt-al task.model.drop_block=True task.sequence_sampler=True task.t_e=10

############### SSN ################

python runner.py train=False seed=${SEED} data=${dataset} ++comet_tags=[${dataset},${TAG},${SEED}] task=ssn
python runner.py train=False seed=${SEED} data=${dataset} ++comet_tags=[${dataset},${TAG},${SEED}] task=ssn task.model.drop_block=True task.t_e=10

################ Aleatoric ################

python runner.py train=False seed=${SEED} data=${dataset} ++comet_tags=[${dataset},${TAG},${SEED}] task=aleatoric
python runner.py train=False seed=${SEED} data=${dataset} ++comet_tags=[${dataset},${TAG},${SEED}] task=aleatoric task.model.drop_block=True task.t_e=10

############### TTA ###################

python runner.py train=False seed=${SEED} data=${dataset} ++comet_tags=[${dataset},${TAG},${SEED}] task=tta task.model.drop_block=False
python runner.py train=False seed=${SEED} data=${dataset} ++comet_tags=[${dataset},${TAG},${SEED}] task=tta task.model.drop_block=True task.t_e=10

############### MC ###################

python runner.py train=False seed=${SEED} data=${dataset} ++comet_tags=[${dataset},${TAG},${SEED}] task=mcdropout task.model.drop_block=True task.t_e=10
python runner.py train=False seed=${SEED} data=${dataset} ++comet_tags=[${dataset},${TAG},${SEED}] task=mcdropout task.model.drop_block=True task.t_e=50
