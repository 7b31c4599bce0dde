#!/bin/bash
set -e
export PYTHONPATH=.

# Train the UDF edge field
python main.py --conf ./confs/Replica.conf --mode train

# Extract parametric edges
python main.py --conf ./confs/Replica.conf --mode extract_edge
