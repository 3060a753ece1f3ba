#!/bin/bash
# Round-5 bootstrap-advantage seed sweep (VERDICT r4 #1).
# Same protocol as the committed seed-0 artifacts: palette dataset,
# K in {5,20,50}, pretrain 10 epochs / finetune 10 epochs, both
# frameworks.  Writes into the committed artifacts/ dir as runs land.
# Plus a 20-ft-epoch variant on seeds 0-1 to check late crossover
# (torch seed-0 ft curves were still climbing at epoch 10).
set -u
cd /root/repo
OUT=/root/repo/artifacts/bootstrap
for seed in 1 2 3 4; do
  for fw in torch hebbax; do
    f=$OUT/explore_palette_${fw}_s${seed}.json
    [ -s "$f" ] && continue
    echo "=== explore $fw s$seed $(date +%T) ===" >> $OUT/sweep_r5.log
    python scripts/explore_bootstrap.py --framework $fw --data palette \
      --ks 5 20 50 --pre_epochs 10 --ft_epochs 10 --seed $seed \
      --out "$f" >> $OUT/sweep_r5.log 2>&1
  done
done
for seed in 0 1; do
  for fw in torch hebbax; do
    f=$OUT/explore_palette_ft20_${fw}_s${seed}.json
    [ -s "$f" ] && continue
    echo "=== explore-ft20 $fw s$seed $(date +%T) ===" >> $OUT/sweep_r5.log
    python scripts/explore_bootstrap.py --framework $fw --data palette \
      --ks 5 20 50 --pre_epochs 10 --ft_epochs 20 --seed $seed \
      --out "$f" >> $OUT/sweep_r5.log 2>&1
  done
done
echo "=== sweep done $(date +%T) ===" >> $OUT/sweep_r5.log
