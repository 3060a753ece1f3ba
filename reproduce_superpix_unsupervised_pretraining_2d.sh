#!/bin/bash

# SUPERPIX unsupervised pretraining, 2D
# (hebbax port of the reference's reproduce_superpix_unsupervised_pretraining_2d.sh; same sweep structure, flags
#  and run-dir layout — checkpoints use the .ckpt extension)

set -e

REPS=1
START_REP=0
GPU=0

BATCH_SIZE=2
EVAL_BATCH_SIZE=2
OPTIMIZER=adam
LR=1e-4
DATASETS=(
    GlaS
    PH2
    HMEPS
    OCT-CME
    QaTa-COV19
)

DATA_ROOT=./data
EXP_ROOT=./runs

for DATASET in ${DATASETS[@]}; do
    python pretrain_superpix_unsup_2d.py --dataset_name $DATASET --network unet_superpix --path_dataset $DATA_ROOT/$DATASET --path_root_exp $EXP_ROOT --batch_size $BATCH_SIZE --optimizer $OPTIMIZER --seed 0 --validate_iter 1 --device $GPU --lr $LR --loss dice
done
