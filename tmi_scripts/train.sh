#!/usr/bin/env bash
# TMI paper training recipes — TPU port of the reference's
# tmi_scripts/train.sh (same tasks/seeds/flags; no ++trainer.devices pinning:
# JAX owns the single TPU chip, multi-chip runs shard via parallel/mesh.py).
# Usage: bash tmi_scripts/train.sh [dataset]   (default: camus)
set -e
SEED=1
dataset=${1:-camus}

############## DSNT-AL ################

python runner.py predict=False seed=${SEED} data=${dataset}-cont ++comet_tags=[${dataset},TRAIN] task=dsnt-al
python runner.py predict=False seed=${SEED} data=${dataset}-cont ++comet_tags=[${dataset},TRAIN] task=dsnt-al task.model.drop_block=True

############## DSNT-SKEW ################
# (Not included in the TMI paper — kept for parity with the reference script.)

python runner.py predict=False seed=${SEED} data=${dataset}-cont ++comet_tags=[${dataset},TRAIN] task=dsnt-skew5
python runner.py predict=False seed=${SEED} data=${dataset}-cont ++comet_tags=[${dataset},TRAIN] task=dsnt-skew9

python runner.py predict=False seed=${SEED} data=${dataset}-cont ++comet_tags=[${dataset},TRAIN] task=dsnt-skew5 task.model.drop_block=True
python runner.py predict=False seed=${SEED} data=${dataset}-cont ++comet_tags=[${dataset},TRAIN] task=dsnt-skew9 task.model.drop_block=True

############## SSN ################

python runner.py predict=False seed=${SEED} data=${dataset} ++comet_tags=[${dataset},TRAIN] task=ssn
python runner.py predict=False seed=${SEED} data=${dataset} ++comet_tags=[${dataset},TRAIN] task=ssn task.model.drop_block=True

################ Aleatoric ################

python runner.py predict=False seed=${SEED} data=${dataset} ++comet_tags=[${dataset},TRAIN] task=aleatoric
python runner.py predict=False seed=${SEED} data=${dataset} ++comet_tags=[${dataset},TRAIN] task=aleatoric task.model.drop_block=True

############### Segmentation ###################

python runner.py predict=False seed=${SEED} data=${dataset} ++comet_tags=[${dataset},TRAIN] task=mcdropout task.model.drop_block=False
python runner.py predict=False seed=${SEED} data=${dataset} ++comet_tags=[${dataset},TRAIN] task=mcdropout task.model.drop_block=True
