#!/bin/bash

# Semi-supervised 3D baselines (EM/UAMT/CPS/URPC/CCT/DTC) on Atrial
# (hebbax port of the reference's reproduce_semi_supervised_3d.sh; same sweep structure, flags
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
PATCH_SIZE='(96,96,80)'
PATCH_OVERLAP='(48,48,40)'

DATA_ROOT=./data
EXP_ROOT=./runs

for DATASET in ${DATASETS[@]}; do
    for REGIME in ${REGIMES[@]}; do
        for REP in $(seq $(( $START_REP )) $(( $REPS - 1 ))); do
            python train_semi_EM_3d.py --dataset_name $DATASET --network $NET3D --path_dataset $DATA_ROOT/$DATASET --path_root_exp $EXP_ROOT --regime $REGIME --batch_size 1 --optimizer $OPTIMIZER --seed $REP --validate_iter 1 --device $GPU --lr $LR --loss dice --unsup_weight $UNSUP_WEIGHT --patch_size $PATCH_SIZE
            python test_3d.py --dataset_name $DATASET --network $NET3D --path_dataset $DATA_ROOT/$DATASET --best JI --path_exp $EXP_ROOT/$DATASET/semi_sup/kaiming_em_${NET3D}/inv_temp-1/regime-$REGIME/run-$REP --device $GPU --patch_size $PATCH_SIZE --patch_overlap $PATCH_OVERLAP --postprocessing True
            python train_semi_UAMT_3d.py --dataset_name $DATASET --network $NET3D --path_dataset $DATA_ROOT/$DATASET --path_root_exp $EXP_ROOT --regime $REGIME --batch_size 1 --optimizer $OPTIMIZER --seed $REP --validate_iter 1 --device $GPU --lr $LR --loss dice --unsup_weight $UNSUP_WEIGHT --patch_size $PATCH_SIZE
            python test_3d.py --dataset_name $DATASET --network $NET3D --path_dataset $DATA_ROOT/$DATASET --best JI --path_exp $EXP_ROOT/$DATASET/semi_sup/kaiming_uamt_${NET3D}/inv_temp-1/regime-$REGIME/run-$REP --device $GPU --patch_size $PATCH_SIZE --patch_overlap $PATCH_OVERLAP --postprocessing True
            python train_semi_CPS_3d.py --dataset_name $DATASET --network $NET3D --path_dataset $DATA_ROOT/$DATASET --path_root_exp $EXP_ROOT --regime $REGIME --batch_size 1 --optimizer $OPTIMIZER --seed $REP --validate_iter 1 --device $GPU --lr $LR --loss dice --unsup_weight $UNSUP_WEIGHT --patch_size $PATCH_SIZE
            python test_3d.py --dataset_name $DATASET --network $NET3D --path_dataset $DATA_ROOT/$DATASET --best JI --path_exp $EXP_ROOT/$DATASET/semi_sup/kaiming_cps_${NET3D}/inv_temp-1/regime-$REGIME/run-$REP --device $GPU --patch_size $PATCH_SIZE --patch_overlap $PATCH_OVERLAP --postprocessing True
            python train_semi_URPC_3d.py --dataset_name $DATASET --network $NET3D_URPC --path_dataset $DATA_ROOT/$DATASET --path_root_exp $EXP_ROOT --regime $REGIME --batch_size 1 --optimizer $OPTIMIZER --seed $REP --validate_iter 1 --device $GPU --lr $LR --loss dice --unsup_weight $UNSUP_WEIGHT --patch_size $PATCH_SIZE
            python test_3d.py --dataset_name $DATASET --network $NET3D_URPC --path_dataset $DATA_ROOT/$DATASET --best JI --path_exp $EXP_ROOT/$DATASET/semi_sup/kaiming_urpc_${NET3D_URPC}/inv_temp-1/regime-$REGIME/run-$REP --device $GPU --patch_size $PATCH_SIZE --patch_overlap $PATCH_OVERLAP --postprocessing True
            python train_semi_CCT_3d.py --dataset_name $DATASET --network $NET3D_CCT --path_dataset $DATA_ROOT/$DATASET --path_root_exp $EXP_ROOT --regime $REGIME --batch_size 1 --optimizer $OPTIMIZER --seed $REP --validate_iter 1 --device $GPU --lr $LR --loss dice --unsup_weight $UNSUP_WEIGHT --patch_size $PATCH_SIZE
            python test_3d.py --dataset_name $DATASET --network $NET3D_CCT --path_dataset $DATA_ROOT/$DATASET --best JI --path_exp $EXP_ROOT/$DATASET/semi_sup/kaiming_cct_${NET3D_CCT}/inv_temp-1/regime-$REGIME/run-$REP --device $GPU --patch_size $PATCH_SIZE --patch_overlap $PATCH_OVERLAP --postprocessing True
            python train_semi_DTC_3d.py --dataset_name $DATASET --network $NET3D_DTC --path_dataset $DATA_ROOT/$DATASET --path_root_exp $EXP_ROOT --regime $REGIME --batch_size 1 --optimizer $OPTIMIZER --seed $REP --validate_iter 1 --device $GPU --lr $LR --loss dice --unsup_weight $UNSUP_WEIGHT --patch_size $PATCH_SIZE
            python test_3d.py --dataset_name $DATASET --network $NET3D_DTC --path_dataset $DATA_ROOT/$DATASET --best JI --path_exp $EXP_ROOT/$DATASET/semi_sup/kaiming_dtc_${NET3D_DTC}/inv_temp-1/regime-$REGIME/run-$REP --device $GPU --patch_size $PATCH_SIZE --patch_overlap $PATCH_OVERLAP --postprocessing True
        done
    done
done
