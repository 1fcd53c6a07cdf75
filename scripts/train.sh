#!/bin/bash
# Training launcher (parity: reference scripts/train.sh exp-dir conventions).
# Usage: sh scripts/train.sh -g <num_chips> -d <dataset> -c <config> -n <exp_name> [-r true]
cd "$(dirname "$0")/.." || exit
PYTHON=python
DATASET=scannet
CONFIG=None
EXP_NAME=debug
WEIGHT=None
RESUME=false
GPU=1
while getopts "p:d:c:n:w:g:r:" opt; do
  case $opt in
    p) PYTHON=$OPTARG ;;
    d) DATASET=$OPTARG ;;
    c) CONFIG=$OPTARG ;;
    n) EXP_NAME=$OPTARG ;;
    w) WEIGHT=$OPTARG ;;
    r) RESUME=$OPTARG ;;
    g) GPU=$OPTARG ;;
    *) echo "invalid option"; exit 1 ;;
  esac
done

EXP_DIR=exp/${DATASET}/${EXP_NAME}
MODEL_DIR=${EXP_DIR}/model
CODE_DIR=${EXP_DIR}/code
CONFIG_DIR=configs/${DATASET}/${CONFIG}.py

echo "Experiment dir: $EXP_DIR"
if [ "${RESUME}" = true ] && [ -d "${EXP_DIR}" ]; then
  CONFIG_DIR=${EXP_DIR}/config.py
  WEIGHT=${MODEL_DIR}/model_last
else
  mkdir -p "$MODEL_DIR" "$CODE_DIR"
  echo "Freezing code snapshot to ${CODE_DIR}"
  cp -r pointcept_tpu tools "$CODE_DIR" 2>/dev/null
fi

if [ "${WEIGHT}" = "None" ]; then
  $PYTHON tools/train.py --config-file "$CONFIG_DIR" --num-gpus "$GPU" \
    --options save_path="$EXP_DIR"
else
  $PYTHON tools/train.py --config-file "$CONFIG_DIR" --num-gpus "$GPU" \
    --options save_path="$EXP_DIR" resume="$RESUME" weight="$WEIGHT"
fi
