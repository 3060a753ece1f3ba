#!/bin/bash

# SWTA-T Hebbian unsupervised pretraining, 3D, inv-temp sweep
# (hebbax port of the reference's reproduce_hebbian_unsupervised_pretraining_3d.sh; same sweep structure, flags
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
    Atrial
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
EXCLUDE_LAYER="conv dsv1 dsv2 dsv3 dsv4 out_conv out_sdf out_seg"
PATCH_SIZE='(96,96,80)'

DATA_ROOT=./data
EXP_ROOT=./runs

for K in ${K_VALUES[@]}; do
    for DATASET in ${DATASETS[@]}; do
        python pretrain_hebbian_unsup_3d.py --dataset_name $DATASET --network unet3d --path_dataset $DATA_ROOT/$DATASET --path_root_exp $EXP_ROOT --batch_size 1 --optimizer $OPTIMIZER --seed 0 --validate_iter 1 --device $GPU --lr $LR --loss dice --hebb_mode $HEBB_MODE --hebb_inv_temp $K --exclude $EXCLUDE_LAYER --patch_size $PATCH_SIZE
        python pretrain_hebbian_unsup_3d.py --dataset_name $DATASET --network unet3d_urpc --path_dataset $DATA_ROOT/$DATASET --path_root_exp $EXP_ROOT --batch_size 1 --optimizer $OPTIMIZER --seed 0 --validate_iter 1 --device $GPU --lr $LR --loss dice --hebb_mode $HEBB_MODE --hebb_inv_temp $K --exclude $EXCLUDE_LAYER --patch_size $PATCH_SIZE
    done
done
