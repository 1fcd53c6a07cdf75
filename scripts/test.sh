#!/bin/bash
# Testing launcher (parity: reference scripts/test.sh).
# Usage: sh scripts/test.sh -d <dataset> -n <exp_name> -w <weight_name>
cd "$(dirname "$0")/.." || exit
PYTHON=python
DATASET=scannet
EXP_NAME=debug
WEIGHT=model_best
GPU=1
while getopts "p:d:n:w:g:" opt; do
  case $opt in
    p) PYTHON=$OPTARG ;;
    d) DATASET=$OPTARG ;;
    n) EXP_NAME=$OPTARG ;;
    w) WEIGHT=$OPTARG ;;
    g) GPU=$OPTARG ;;
    *) echo "invalid option"; exit 1 ;;
  esac
done
EXP_DIR=exp/${DATASET}/${EXP_NAME}
$PYTHON tools/test.py --config-file "${EXP_DIR}/config.py" --num-gpus "$GPU" \
  --options save_path="$EXP_DIR" weight="${EXP_DIR}/model/${WEIGHT}"
