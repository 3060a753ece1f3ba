#!/bin/bash

# Semi-supervised 3D fine-tuning from vae pretraining
# (hebbax port of the reference's reproduce_vae_semi_supervised_3d.sh; same sweep structure, flags
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

UNSUP_WEIGHT=5
REGIMES=(
    1
    2
    5
    10
    20
)

DATA_ROOT=./data
EXP_ROOT=./runs

for DATASET in ${DATASETS[@]}; do
    for REGIME in ${REGIMES[@]}; do
        for REP in $(seq $(( $START_REP )) $(( $REPS - 1 ))); do
            WEIGHTS=$EXP_ROOT/$DATASET/vae_unsup/unet3d_vae/inv_temp-1/regime-100/run-0/checkpoints/last.ckpt
            python train_semi_EM_3d.py --dataset_name $DATASET --network $NET3D --path_dataset $DATA_ROOT/$DATASET --path_root_exp $EXP_ROOT --regime $REGIME --batch_size $BATCH_SIZE --optimizer $OPTIMIZER --seed $REP --validate_iter 1 --device $GPU --lr $LR --loss dice --unsup_weight $UNSUP_WEIGHT --load_weights $WEIGHTS --patch_size '(96,96,80)'
            python test_3d.py --dataset_name $DATASET --network $NET3D --path_dataset $DATA_ROOT/$DATASET --best JI --path_exp $EXP_ROOT/$DATASET/semi_sup/em_${NET3D}/inv_temp-1/regime-$REGIME/run-$REP --device $GPU --patch_size '(96,96,80)' --patch_overlap '(48,48,40)' --postprocessing True
        done
    done
done
