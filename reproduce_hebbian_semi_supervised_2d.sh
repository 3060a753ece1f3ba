#!/bin/bash

# Hebbian-bootstrapped semi-supervised 2D (EM/UAMT/CPS/URPC/CCT) over inv-temp x regime
# (hebbax port of the reference's reproduce_hebbian_semi_supervised_2d.sh; same sweep structure, flags
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

UNSUP_WEIGHT=5
VALIDATE_ITER=1

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

HEBB_MODE=swta_t

DATA_ROOT=./data
EXP_ROOT=./runs

for K in ${K_VALUES[@]}; do
    for DATASET in ${DATASETS[@]}; do
        for REGIME in ${REGIMES[@]}; do
                for REP in $(seq $(( $START_REP )) $(( $REPS - 1 ))); do
                    HEBBIAN_WEIGHTS_PATH="$EXP_ROOT/$DATASET/hebbian_unsup/unet_${HEBB_MODE}/inv-temp-$K/regime-100/run-0/checkpoints/last.ckpt"
                    HEBBIAN_WEIGHTS_PATH="$EXP_ROOT/$DATASET/hebbian_unsup/unet_${HEBB_MODE}/inv_temp-$K/regime-100/run-0/checkpoints/last.ckpt"
                    python train_semi_EM_2d.py --dataset_name $DATASET --network $NET --path_dataset $DATA_ROOT/$DATASET --path_root_exp $EXP_ROOT --regime $REGIME --batch_size $BATCH_SIZE --optimizer $OPTIMIZER --seed $REP --validate_iter $VALIDATE_ITER --device $GPU --lr $LR --loss dice --unsup_weight $UNSUP_WEIGHT --load_hebbian_weights $HEBBIAN_WEIGHTS_PATH --hebbian_rule $HEBB_MODE --hebb_inv_temp $K
                    python test_2d.py --dataset_name $DATASET --network $NET --batch_size $EVAL_BATCH_SIZE --path_dataset $DATA_ROOT/$DATASET --best JI --path_exp $EXP_ROOT/$DATASET/semi_sup/h_em_${NET}_$HEBB_MODE/inv_temp-$K/regime-$REGIME/run-$REP --device $GPU --hebbian_pretrain True
                done
                for REP in $(seq $(( $START_REP )) $(( $REPS - 1 ))); do
                    HEBBIAN_WEIGHTS_PATH="$EXP_ROOT/$DATASET/hebbian_unsup/unet_${HEBB_MODE}/inv-temp-$K/regime-100/run-0/checkpoints/last.ckpt"
                    HEBBIAN_WEIGHTS_PATH="$EXP_ROOT/$DATASET/hebbian_unsup/unet_${HEBB_MODE}/inv_temp-$K/regime-100/run-0/checkpoints/last.ckpt"
                    python train_semi_UAMT_2d.py --dataset_name $DATASET --network $NET --path_dataset $DATA_ROOT/$DATASET --path_root_exp $EXP_ROOT --regime $REGIME --batch_size $BATCH_SIZE --optimizer $OPTIMIZER --seed $REP --validate_iter $VALIDATE_ITER --device $GPU --lr $LR --loss dice --unsup_weight $UNSUP_WEIGHT --load_hebbian_weights $HEBBIAN_WEIGHTS_PATH --hebbian_rule $HEBB_MODE --hebb_inv_temp $K
                    python test_2d.py --dataset_name $DATASET --network $NET --batch_size $EVAL_BATCH_SIZE --path_dataset $DATA_ROOT/$DATASET --best JI --path_exp $EXP_ROOT/$DATASET/semi_sup/h_uamt_${NET}_$HEBB_MODE/inv_temp-$K/regime-$REGIME/run-$REP --device $GPU --hebbian_pretrain True
                done
                for REP in $(seq $(( $START_REP )) $(( $REPS - 1 ))); do
                    HEBBIAN_WEIGHTS_PATH="$EXP_ROOT/$DATASET/hebbian_unsup/unet_${HEBB_MODE}/inv-temp-$K/regime-100/run-0/checkpoints/last.ckpt"
                    HEBBIAN_WEIGHTS_PATH="$EXP_ROOT/$DATASET/hebbian_unsup/unet_${HEBB_MODE}/inv_temp-$K/regime-100/run-0/checkpoints/last.ckpt"
                    python train_semi_CPS_2d.py --dataset_name $DATASET --network $NET --path_dataset $DATA_ROOT/$DATASET --path_root_exp $EXP_ROOT --regime $REGIME --batch_size $BATCH_SIZE --optimizer $OPTIMIZER --seed $REP --validate_iter $VALIDATE_ITER --device $GPU --lr $LR --loss dice --unsup_weight $UNSUP_WEIGHT --load_hebbian_weights $HEBBIAN_WEIGHTS_PATH --hebbian_rule $HEBB_MODE --hebb_inv_temp $K
                    python test_2d.py --dataset_name $DATASET --network $NET --batch_size $EVAL_BATCH_SIZE --path_dataset $DATA_ROOT/$DATASET --best JI --path_exp $EXP_ROOT/$DATASET/semi_sup/h_cps_${NET}_$HEBB_MODE/inv_temp-$K/regime-$REGIME/run-$REP --device $GPU --hebbian_pretrain True
                done
                for REP in $(seq $(( $START_REP )) $(( $REPS - 1 ))); do
                    HEBBIAN_WEIGHTS_PATH="$EXP_ROOT/$DATASET/hebbian_unsup/unet_${HEBB_MODE}/inv-temp-$K/regime-100/run-0/checkpoints/last.ckpt"
                    HEBBIAN_WEIGHTS_PATH="$EXP_ROOT/$DATASET/hebbian_unsup/unet_${HEBB_MODE}/inv_temp-$K/regime-100/run-0/checkpoints/last.ckpt"
                    python train_semi_URPC_2d.py --dataset_name $DATASET --network $NET_URPC --path_dataset $DATA_ROOT/$DATASET --path_root_exp $EXP_ROOT --regime $REGIME --batch_size $BATCH_SIZE --optimizer $OPTIMIZER --seed $REP --validate_iter $VALIDATE_ITER --device $GPU --lr $LR --loss dice --unsup_weight $UNSUP_WEIGHT --load_hebbian_weights $HEBBIAN_WEIGHTS_PATH --hebbian_rule $HEBB_MODE --hebb_inv_temp $K
                    python test_2d.py --dataset_name $DATASET --network $NET_URPC --batch_size $EVAL_BATCH_SIZE --path_dataset $DATA_ROOT/$DATASET --best JI --path_exp $EXP_ROOT/$DATASET/semi_sup/h_urpc_${NET_URPC}_$HEBB_MODE/inv_temp-$K/regime-$REGIME/run-$REP --device $GPU --hebbian_pretrain True
                done
                for REP in $(seq $(( $START_REP )) $(( $REPS - 1 ))); do
                    HEBBIAN_WEIGHTS_PATH="$EXP_ROOT/$DATASET/hebbian_unsup/unet_${HEBB_MODE}/inv-temp-$K/regime-100/run-0/checkpoints/last.ckpt"
                    HEBBIAN_WEIGHTS_PATH="$EXP_ROOT/$DATASET/hebbian_unsup/unet_${HEBB_MODE}/inv_temp-$K/regime-100/run-0/checkpoints/last.ckpt"
                    python train_semi_CCT_2d.py --dataset_name $DATASET --network $NET_CCT --path_dataset $DATA_ROOT/$DATASET --path_root_exp $EXP_ROOT --regime $REGIME --batch_size $BATCH_SIZE --optimizer $OPTIMIZER --seed $REP --validate_iter $VALIDATE_ITER --device $GPU --lr $LR --loss dice --unsup_weight $UNSUP_WEIGHT --load_hebbian_weights $HEBBIAN_WEIGHTS_PATH --hebbian_rule $HEBB_MODE --hebb_inv_temp $K
                    python test_2d.py --dataset_name $DATASET --network $NET_CCT --batch_size $EVAL_BATCH_SIZE --path_dataset $DATA_ROOT/$DATASET --best JI --path_exp $EXP_ROOT/$DATASET/semi_sup/h_cct_${NET_CCT}_$HEBB_MODE/inv_temp-$K/regime-$REGIME/run-$REP --device $GPU --hebbian_pretrain True
                done
        done
    done
done
