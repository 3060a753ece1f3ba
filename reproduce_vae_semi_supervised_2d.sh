#!/bin/bash

# Semi-supervised 2D fine-tuning from vae pretraining
# (hebbax port of the reference's reproduce_vae_semi_supervised_2d.sh; same sweep structure, flags
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
            WEIGHTS=$EXP_ROOT/$DATASET/vae_unsup/unet_vae/inv_temp-1/regime-100/run-0/checkpoints/last.ckpt
            python train_semi_EM_2d.py --dataset_name $DATASET --network $NET --path_dataset $DATA_ROOT/$DATASET --path_root_exp $EXP_ROOT --regime $REGIME --batch_size $BATCH_SIZE --optimizer $OPTIMIZER --seed $REP --validate_iter 1 --device $GPU --lr $LR --loss dice --unsup_weight $UNSUP_WEIGHT --load_weights $WEIGHTS
            python test_2d.py --dataset_name $DATASET --network $NET --path_dataset $DATA_ROOT/$DATASET --best JI --path_exp $EXP_ROOT/$DATASET/semi_sup/em_${NET}/inv_temp-1/regime-$REGIME/run-$REP --device $GPU
        done
    done
done
