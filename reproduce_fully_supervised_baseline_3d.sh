#!/bin/bash

# Fully-supervised 3D baselines at regime 100%
# (hebbax port of the reference's reproduce_fully_supervised_baseline_3d.sh; same sweep structure, flags
#  and run-dir layout — checkpoints use the .ckpt extension)

set -e

REPS=5
START_REP=0
GPU=0

# TPU fast path: s2d-folded exact-parity variants of the reference nets
# (same param tree, tests/test_s2d3d.py etc.); set NET3D=unet3d for the
# unfolded originals.
NET3D=unet3d_s2d
NET3D_URPC=unet3d_urpc_s2d
NET3D_CCT=unet3d_cct_s2d_rc
NET3D_DTC=unet3d_dtc_s2d

BATCH_SIZE=2
EVAL_BATCH_SIZE=2
OPTIMIZER=sgd
LR=0.1
DATASETS=(
    Atrial
)

DATA_ROOT=./data
EXP_ROOT=./runs

PATCH_SIZE='(96,96,80)'
PATCH_OVERLAP='(48,48,40)'

# Train & Test
for DATASET in ${DATASETS[@]}; do
    for REP in $(seq $(( $START_REP )) $(( $REPS - 1 ))); do
        python train_sup_3d.py --dataset_name $DATASET --network $NET3D --path_dataset $DATA_ROOT/$DATASET --path_root_exp $EXP_ROOT --regime 100 --batch_size 1 --optimizer $OPTIMIZER --seed $REP --validate_iter 2 --device $GPU --lr $LR --loss dice --patch_size $PATCH_SIZE
        python test_3d.py --dataset_name $DATASET --network $NET3D --path_dataset $DATA_ROOT/$DATASET --best JI --path_exp $EXP_ROOT/$DATASET/fully_sup/${NET3D}/inv_temp-1/regime-100/run-$REP --device $GPU --patch_size $PATCH_SIZE --patch_overlap $PATCH_OVERLAP --postprocessing True
    done
done
