bash -c "python tools/train_val.py --config $1 -e"
