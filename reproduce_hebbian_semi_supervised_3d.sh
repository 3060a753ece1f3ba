#!/bin/bash

# Hebbian-bootstrapped semi-supervised 3D over inv-temp x regime
# (hebbax port of the reference's reproduce_hebbian_semi_supervised_3d.sh; same sweep structure, flags
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
K_VALUES=(
    1
    5
    10
    20
    50
    75
    100
)
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

for K in ${K_VALUES[@]}; do
  for DATASET in ${DATASETS[@]}; do
    for REGIME in ${REGIMES[@]}; do
        for REP in $(seq $(( $START_REP )) $(( $REPS - 1 ))); do
            python train_semi_EM_3d.py --dataset_name $DATASET --network $NET3D --path_dataset $DATA_ROOT/$DATASET --path_root_exp $EXP_ROOT --regime $REGIME --batch_size 1 --optimizer $OPTIMIZER --seed $REP --validate_iter 1 --device $GPU --lr $LR --loss dice --unsup_weight $UNSUP_WEIGHT --patch_size $PATCH_SIZE --load_hebbian_weights $EXP_ROOT/$DATASET/hebbian_unsup/unet3d_swta_t/inv_temp-$K/regime-100/run-0/checkpoints/last.ckpt --hebbian_rule swta_t --hebb_inv_temp $K
            python test_3d.py --dataset_name $DATASET --network $NET3D --path_dataset $DATA_ROOT/$DATASET --best JI --path_exp $EXP_ROOT/$DATASET/semi_sup/h_em_${NET3D}_swta_t/inv_temp-$K/regime-$REGIME/run-$REP --device $GPU --patch_size $PATCH_SIZE --patch_overlap $PATCH_OVERLAP --postprocessing True
            python train_semi_UAMT_3d.py --dataset_name $DATASET --network $NET3D --path_dataset $DATA_ROOT/$DATASET --path_root_exp $EXP_ROOT --regime $REGIME --batch_size 1 --optimizer $OPTIMIZER --seed $REP --validate_iter 1 --device $GPU --lr $LR --loss dice --unsup_weight $UNSUP_WEIGHT --patch_size $PATCH_SIZE --load_hebbian_weights $EXP_ROOT/$DATASET/hebbian_unsup/unet3d_swta_t/inv_temp-$K/regime-100/run-0/checkpoints/last.ckpt --hebbian_rule swta_t --hebb_inv_temp $K
            python test_3d.py --dataset_name $DATASET --network $NET3D --path_dataset $DATA_ROOT/$DATASET --best JI --path_exp $EXP_ROOT/$DATASET/semi_sup/h_uamt_${NET3D}_swta_t/inv_temp-$K/regime-$REGIME/run-$REP --device $GPU --patch_size $PATCH_SIZE --patch_overlap $PATCH_OVERLAP --postprocessing True
            python train_semi_CPS_3d.py --dataset_name $DATASET --network $NET3D --path_dataset $DATA_ROOT/$DATASET --path_root_exp $EXP_ROOT --regime $REGIME --batch_size 1 --optimizer $OPTIMIZER --seed $REP --validate_iter 1 --device $GPU --lr $LR --loss dice --unsup_weight $UNSUP_WEIGHT --patch_size $PATCH_SIZE --load_hebbian_weights $EXP_ROOT/$DATASET/hebbian_unsup/unet3d_swta_t/inv_temp-$K/regime-100/run-0/checkpoints/last.ckpt --hebbian_rule swta_t --hebb_inv_temp $K
            python test_3d.py --dataset_name $DATASET --network $NET3D --path_dataset $DATA_ROOT/$DATASET --best JI --path_exp $EXP_ROOT/$DATASET/semi_sup/h_cps_${NET3D}_swta_t/inv_temp-$K/regime-$REGIME/run-$REP --device $GPU --patch_size $PATCH_SIZE --patch_overlap $PATCH_OVERLAP --postprocessing True
            python train_semi_URPC_3d.py --dataset_name $DATASET --network $NET3D_URPC --path_dataset $DATA_ROOT/$DATASET --path_root_exp $EXP_ROOT --regime $REGIME --batch_size 1 --optimizer $OPTIMIZER --seed $REP --validate_iter 1 --device $GPU --lr $LR --loss dice --unsup_weight $UNSUP_WEIGHT --patch_size $PATCH_SIZE --load_hebbian_weights $EXP_ROOT/$DATASET/hebbian_unsup/unet3d_swta_t/inv_temp-$K/regime-100/run-0/checkpoints/last.ckpt --hebbian_rule swta_t --hebb_inv_temp $K
            python test_3d.py --dataset_name $DATASET --network $NET3D_URPC --path_dataset $DATA_ROOT/$DATASET --best JI --path_exp $EXP_ROOT/$DATASET/semi_sup/h_urpc_${NET3D_URPC}_swta_t/inv_temp-$K/regime-$REGIME/run-$REP --device $GPU --patch_size $PATCH_SIZE --patch_overlap $PATCH_OVERLAP --postprocessing True
            python train_semi_CCT_3d.py --dataset_name $DATASET --network $NET3D_CCT --path_dataset $DATA_ROOT/$DATASET --path_root_exp $EXP_ROOT --regime $REGIME --batch_size 1 --optimizer $OPTIMIZER --seed $REP --validate_iter 1 --device $GPU --lr $LR --loss dice --unsup_weight $UNSUP_WEIGHT --patch_size $PATCH_SIZE --load_hebbian_weights $EXP_ROOT/$DATASET/hebbian_unsup/unet3d_swta_t/inv_temp-$K/regime-100/run-0/checkpoints/last.ckpt --hebbian_rule swta_t --hebb_inv_temp $K
            python test_3d.py --dataset_name $DATASET --network $NET3D_CCT --path_dataset $DATA_ROOT/$DATASET --best JI --path_exp $EXP_ROOT/$DATASET/semi_sup/h_cct_${NET3D_CCT}_swta_t/inv_temp-$K/regime-$REGIME/run-$REP --device $GPU --patch_size $PATCH_SIZE --patch_overlap $PATCH_OVERLAP --postprocessing True
        done
    done
  done
done
