# Convenience targets (the reference drives everything through
# `make docker-run-mpi`; here the runtime is jax — no containers/MPI needed).

PYTHON ?= python

.PHONY: test test-fast bench train-kitti overfit vis clean-native

test:
	$(PYTHON) -m pytest tests/ -q

test-fast:
	$(PYTHON) -m pytest tests/ -q -m "not slow"

bench:
	$(PYTHON) bench.py

train-kitti:
	$(PYTHON) scripts/train.py +experiments=dd3d_kitti_dla34

overfit:
	$(PYTHON) scripts/train.py +experiments=dd3d_kitti_dla34_overfit

vis:
	$(PYTHON) scripts/visualize_dataloader.py --experiment dd3d_kitti_dla34

# serving-style inference over raw images: make predict IMAGES=/data/frames \
#   INTRINSICS=721.5,721.5,609.5,172.8 [CKPT=/path/model.pth]
predict:
	$(PYTHON) scripts/predict.py --experiment dd3d_kitti_dla34 \
	  --images $(IMAGES) --intrinsics $(INTRINSICS) $(if $(CKPT),--ckpt $(CKPT))

clean-native:
	rm -f dd3d_tpu/evaluators/native/*.so dd3d_tpu/data/native/*.so
