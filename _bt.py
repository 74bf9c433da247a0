import sys
sys.path.insert(0, "scripts")
from bench_train import main
main(batch=40, iters=8)
