#!/bin/bash

# Supervised spiking VGG9 2D
# (hebbax port of the reference's reproduce_snn_fully_supervised_2d.sh; same sweep structure, flags
#  and run-dir layout — checkpoints use the .ckpt extension)

set -e

REPS=10
START_REP=0
GPU=0

BATCH_SIZE=2
EVAL_BATCH_SIZE=2
OPTIMIZER=adam
LR=0.001
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
    for REP in $(seq $(( $START_REP )) $(( $REPS - 1 ))); do
        python train_snn_sup_2d.py --dataset_name $DATASET --network snn_vgg --path_dataset $DATA_ROOT/$DATASET --path_root_exp $EXP_ROOT --regime 100 --batch_size $BATCH_SIZE --optimizer $OPTIMIZER --seed $REP --validate_iter 2 --device $GPU --lr $LR --loss dice
        python test_snn_2d.py --dataset_name $DATASET --batch_size $EVAL_BATCH_SIZE --path_dataset $DATA_ROOT/$DATASET --best JI --path_exp $EXP_ROOT/$DATASET/fully_sup/snn_vgg/inv_temp-1/regime-100/run-$REP --device $GPU
    done
done
