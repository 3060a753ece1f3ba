#!/bin/bash

# Fully-supervised 2D baselines at regime 100%
# (hebbax port of the reference's reproduce_fully_supervised_baseline_2d.sh; same sweep structure, flags
#  and run-dir layout — checkpoints use the .ckpt extension)

set -e

REPS=10
START_REP=0
GPU=0

# TPU fast path: s2d-folded exact-parity variants of the reference nets
# (same param tree, tests/test_s2d*.py); set NET=unet etc. for the
# unfolded originals.
NET=unet_s2d
NET_URPC=unet_urpc_s2d
NET_CCT=unet_cct_s2d

BATCH_SIZE=2
EVAL_BATCH_SIZE=2
OPTIMIZER=sgd
LR=0.5
DATASETS=(
    GlaS
    PH2
    HMEPS
    OCT-CME
    QaTa-COV19
)

DATA_ROOT=./data
EXP_ROOT=./runs

# Train & Test
for DATASET in ${DATASETS[@]}; do
    for REP in $(seq $(( $START_REP )) $(( $REPS - 1 ))); do
        python train_sup_2d.py --dataset_name $DATASET --network $NET --path_dataset $DATA_ROOT/$DATASET --path_root_exp $EXP_ROOT --regime 100 --batch_size $BATCH_SIZE --optimizer $OPTIMIZER --seed $REP --validate_iter 2 --device $GPU --lr $LR --loss dice
        python test_2d.py --dataset_name $DATASET --network $NET --batch_size $EVAL_BATCH_SIZE --path_dataset $DATA_ROOT/$DATASET --best JI --path_exp $EXP_ROOT/$DATASET/fully_sup/${NET}/inv_temp-1/regime-100/run-$REP --device $GPU
    done
done
