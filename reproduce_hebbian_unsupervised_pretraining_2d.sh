#!/bin/bash

# SWTA-T Hebbian unsupervised pretraining, 2D, inv-temp sweep
# (hebbax port of the reference's reproduce_hebbian_unsupervised_pretraining_2d.sh; same sweep structure, flags
#  and run-dir layout — checkpoints use the .ckpt extension)

set -e

REPS=1
START_REP=0
GPU=0

BATCH_SIZE=2
EVAL_BATCH_SIZE=2
OPTIMIZER=adam
LR=1e-06
DATASETS=(
    GlaS
    PH2
    HMEPS
    OCT-CME
    QaTa-COV19
)

K_VALUES=(
    1
    5
    10
    20
    50
    75
    100
)

HEBB_MODE=swta_t
VALIDATE_ITER=1
EXCLUDE_LAYER="out_conv_dp1 out_conv_dp2 out_conv_dp3 out_conv"

DATA_ROOT=./data
EXP_ROOT=./runs

# Pretrain (plain + urpc + cct backbones)
for K in ${K_VALUES[@]}; do
    for DATASET in ${DATASETS[@]}; do
        python pretrain_hebbian_unsup_2d.py --dataset_name $DATASET --network unet --path_dataset $DATA_ROOT/$DATASET --path_root_exp $EXP_ROOT --batch_size $BATCH_SIZE --optimizer $OPTIMIZER --seed 0 --validate_iter $VALIDATE_ITER --device $GPU --lr $LR --loss dice --hebb_mode $HEBB_MODE --hebb_inv_temp $K --exclude $EXCLUDE_LAYER
        python pretrain_hebbian_unsup_2d.py --dataset_name $DATASET --network unet_urpc --path_dataset $DATA_ROOT/$DATASET --path_root_exp $EXP_ROOT --batch_size $BATCH_SIZE --optimizer $OPTIMIZER --seed 0 --validate_iter $VALIDATE_ITER --device $GPU --lr $LR --loss dice --hebb_mode $HEBB_MODE --hebb_inv_temp $K --exclude $EXCLUDE_LAYER
        python pretrain_hebbian_unsup_2d.py --dataset_name $DATASET --network unet_cct --path_dataset $DATA_ROOT/$DATASET --path_root_exp $EXP_ROOT --batch_size $BATCH_SIZE --optimizer $OPTIMIZER --seed 0 --validate_iter $VALIDATE_ITER --device $GPU --lr $LR --loss dice --hebb_mode $HEBB_MODE --hebb_inv_temp $K --exclude out_conv
    done
done
