"""PyTorch re-execution of the reference DD3D TRAINING path, for parity tests.

Faithful plain-torch mirrors of:
- DD3DTargetPreparer (tridet/modeling/dd3d/prepare_targets.py:11-235),
- FCOS2DLoss (tridet/modeling/dd3d/fcos2d.py:159-239),
- FCOS3DLoss + predictions_to_boxes3d + DisentangledBox3DLoss
  (tridet/modeling/dd3d/fcos3d.py:16-52,191-299, disentangled_box3d_loss.py),
- NuscenesLoss (tridet/modeling/dd3d/nuscenes_dd3d.py:199-265),
plus the geometry they depend on (pytorch3d quaternion<->matrix conversions,
allocentric_to_egocentric of tridet/utils/geometry.py:15-55, and the
vision-parameterized Boxes3D corners of tridet/structures/boxes3d.py).

These are single-process semantics: every reference `reduce_sum(x)/world`
becomes plain `x`. Intentional reference quirks preserved:
- the disentangled loss's `loss.clamp(max=...)` is NON-inplace with the
  result discarded — a no-op (disentangled_box3d_loss.py:43),
- NuscenesLoss's attribute branch calls F.cross_entropy with its default
  MEAN reduction, then multiplies by the summed centerness weights and
  divides by max(same sum, 1e-6) (nuscenes_dd3d.py:230-239).

Test oracle, not product code.
"""
import torch
import torch.nn.functional as F

INF = 100000000.0
EPS = 1e-7


# --------------------------------------------------------------------------
# Geometry (pytorch3d rotation_conversions + tridet/utils/geometry.py)
# --------------------------------------------------------------------------

def quaternion_to_matrix(quat):
    """(N, 4) wxyz -> (N, 3, 3), pytorch3d convention."""
    w, x, y, z = quat.unbind(-1)
    two_s = 2.0 / (quat * quat).sum(-1)
    m = torch.stack(
        [
            1 - two_s * (y * y + z * z), two_s * (x * y - z * w), two_s * (x * z + y * w),
            two_s * (x * y + z * w), 1 - two_s * (x * x + z * z), two_s * (y * z - x * w),
            two_s * (x * z - y * w), two_s * (y * z + x * w), 1 - two_s * (x * x + y * y),
        ],
        dim=-1,
    )
    return m.reshape(quat.shape[:-1] + (3, 3))


def _sqrt_positive_part(x):
    ret = torch.zeros_like(x)
    positive_mask = x > 0
    ret[positive_mask] = torch.sqrt(x[positive_mask])
    return ret


def matrix_to_quaternion(matrix):
    """(N, 3, 3) -> (N, 4) wxyz, pytorch3d's 4-candidate algorithm."""
    batch_dim = matrix.shape[:-2]
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = torch.unbind(matrix.reshape(batch_dim + (9,)), dim=-1)
    q_abs = _sqrt_positive_part(
        torch.stack(
            [1.0 + m00 + m11 + m22, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
            dim=-1,
        )
    )
    quat_by_rijk = torch.stack(
        [
            torch.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], dim=-1),
            torch.stack([m21 - m12, q_abs[..., 1] ** 2, m01 + m10, m02 + m20], dim=-1),
            torch.stack([m02 - m20, m01 + m10, q_abs[..., 2] ** 2, m12 + m21], dim=-1),
            torch.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], dim=-1),
        ],
        dim=-2,
    )
    flr = torch.tensor(0.1).to(dtype=q_abs.dtype, device=q_abs.device)
    quat_candidates = quat_by_rijk / (2.0 * q_abs[..., None].max(flr))
    return quat_candidates[
        F.one_hot(q_abs.argmax(dim=-1), num_classes=4) > 0.5, :
    ].reshape(batch_dim + (4,))


def homogenize_points(xy):
    pad = torch.nn.ConstantPad1d(padding=(0, 1), value=1.0)
    return pad(xy)


def unproject_points2d(points2d, inv_K, scale=1.0):
    points2d = homogenize_points(points2d)
    if inv_K.dim() == 2:
        return points2d @ inv_K.T * scale
    return (inv_K @ points2d.unsqueeze(-1)).squeeze(-1) * scale


def allocentric_to_egocentric(quat, proj_ctr, inv_intrinsics):
    """tridet/utils/geometry.py:15-55 verbatim semantics."""
    R_obj_to_local = quaternion_to_matrix(quat)
    ray = unproject_points2d(proj_ctr, inv_intrinsics)
    z = ray / ray.norm(dim=1, keepdim=True)
    y = z.new_tensor([[0.0, 1.0, 0.0]]) - z[:, 1:2] * z
    y = y / y.norm(dim=1, keepdim=True)
    x = torch.cross(y, z, dim=1)
    R_local_to_global = torch.stack([x, y, z], dim=-1)
    R_obj_to_global = torch.bmm(R_local_to_global, R_obj_to_local)
    egocentric_quat = matrix_to_quaternion(R_obj_to_global)
    quat_norm = egocentric_quat.norm(dim=1, keepdim=True)
    if not torch.allclose(quat_norm, torch.as_tensor(1.0), atol=1e-3):
        egocentric_quat = egocentric_quat / quat_norm.clamp(min=EPS)
    return egocentric_quat


BOX3D_CORNER_MAPPING = [
    [1, 1, 1, 1, -1, -1, -1, -1],
    [1, -1, -1, 1, 1, -1, -1, 1],
    [1, 1, -1, -1, 1, 1, -1, -1],
]


class VisionBoxes3D:
    """Vision-parameterized Boxes3D (tridet/structures/boxes3d.py:157-289):
    quat (N,4) + proj_ctr (N,2) + depth (N,1) + size (N,3 wlh) + per-box
    inv_intrinsics (N,3,3). tvec derived; corners rotate the wlh->lwh-swapped
    canonical corners then translate (boxes3d.py:48-64)."""

    def __init__(self, quat, proj_ctr, depth, size, inv_intrinsics):
        self.quat = quat
        self.proj_ctr = proj_ctr
        self.depth = depth
        self.size = size
        self.inv_intrinsics = inv_intrinsics

    @property
    def tvec(self):
        ray = unproject_points2d(self.proj_ctr, self.inv_intrinsics)
        return ray * self.depth

    @property
    def corners(self):
        quat = self.quat.to(torch.float32)
        R = quaternion_to_matrix(quat)
        _corners = 0.5 * quat.new_tensor(BOX3D_CORNER_MAPPING).T  # (8, 3)
        lwh = self.size.to(torch.float32)[:, [1, 0, 2]]
        corners_obj = lwh.unsqueeze(1) * _corners.unsqueeze(0)  # (N, 8, 3)
        return torch.einsum("nij,nkj->nki", R, corners_obj) + self.tvec.to(torch.float32).unsqueeze(1)

    def __getitem__(self, item):
        return VisionBoxes3D(
            self.quat[item], self.proj_ctr[item], self.depth[item], self.size[item], self.inv_intrinsics[item]
        )

    def __len__(self):
        return self.quat.shape[0]

    def clone(self):
        return VisionBoxes3D(
            self.quat.clone(), self.proj_ctr.clone(), self.depth.clone(), self.size.clone(),
            self.inv_intrinsics.clone()
        )

    def to(self, *args, **kwargs):
        return VisionBoxes3D(
            self.quat.to(*args, **kwargs), self.proj_ctr.to(*args, **kwargs), self.depth.to(*args, **kwargs),
            self.size.to(*args, **kwargs), self.inv_intrinsics.to(*args, **kwargs)
        )

    @classmethod
    def cat(cls, boxes_list):
        return cls(
            torch.cat([b.quat for b in boxes_list]),
            torch.cat([b.proj_ctr for b in boxes_list]),
            torch.cat([b.depth for b in boxes_list]),
            torch.cat([b.size for b in boxes_list]),
            torch.cat([b.inv_intrinsics for b in boxes_list]),
        )

    def split(self, split_sizes):
        return [
            VisionBoxes3D(*parts)
            for parts in zip(
                torch.split(self.quat, split_sizes),
                torch.split(self.proj_ctr, split_sizes),
                torch.split(self.depth, split_sizes),
                torch.split(self.size, split_sizes),
                torch.split(self.inv_intrinsics, split_sizes),
            )
        ]


# --------------------------------------------------------------------------
# Loss primitives (fvcore sigmoid_focal_loss, tridet/layers)
# --------------------------------------------------------------------------

def sigmoid_focal_loss(inputs, targets, alpha=0.25, gamma=2.0, reduction="sum"):
    p = torch.sigmoid(inputs)
    ce_loss = F.binary_cross_entropy_with_logits(inputs, targets, reduction="none")
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce_loss * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    if reduction == "sum":
        return loss.sum()
    return loss


def smooth_l1_loss(input, target, beta, reduction="none"):
    """fvcore variant (tridet/layers/smooth_l1_loss.py:58-73)."""
    if beta < 1e-5:
        loss = torch.abs(input - target)
    else:
        n = torch.abs(input - target)
        cond = n < beta
        loss = torch.where(cond, 0.5 * n ** 2 / beta, n - 0.5 * beta)
    if reduction == "sum":
        return loss.sum()
    return loss


def iou_loss(pred, target, weight=None, loc_loss_type="giou"):
    """tridet/layers/iou_loss.py:8-71."""
    pred_left, pred_top, pred_right, pred_bottom = pred.unbind(1)
    target_left, target_top, target_right, target_bottom = target.unbind(1)

    target_area = (target_left + target_right) * (target_top + target_bottom)
    pred_area = (pred_left + pred_right) * (pred_top + pred_bottom)

    w_intersect = torch.min(pred_left, target_left) + torch.min(pred_right, target_right)
    h_intersect = torch.min(pred_bottom, target_bottom) + torch.min(pred_top, target_top)
    g_w_intersect = torch.max(pred_left, target_left) + torch.max(pred_right, target_right)
    g_h_intersect = torch.max(pred_bottom, target_bottom) + torch.max(pred_top, target_top)
    ac_uion = g_w_intersect * g_h_intersect

    area_intersect = w_intersect * h_intersect
    area_union = target_area + pred_area - area_intersect

    ious = (area_intersect + 1.0) / (area_union + 1.0)
    gious = ious - (ac_uion - area_union) / ac_uion
    if loc_loss_type == "iou":
        losses = -torch.log(ious)
    elif loc_loss_type == "linear_iou":
        losses = 1 - ious
    elif loc_loss_type == "giou":
        losses = 1 - gious
    else:
        raise NotImplementedError
    if weight is not None:
        return (losses * weight).sum()
    return losses.sum()


def compute_ctrness_targets(reg_targets):
    """tridet/modeling/dd3d/fcos2d.py:20-27."""
    if len(reg_targets) == 0:
        return reg_targets.new_zeros(len(reg_targets))
    left_right = reg_targets[:, [0, 2]]
    top_bottom = reg_targets[:, [1, 3]]
    ctrness = (left_right.min(dim=-1)[0] / left_right.max(dim=-1)[0]) * \
              (top_bottom.min(dim=-1)[0] / top_bottom.max(dim=-1)[0])
    return torch.sqrt(ctrness)


def compute_features_locations(h, w, stride, offset="none"):
    """tridet/utils/tensor2d.py:6-25."""
    shifts_x = torch.arange(0, w * stride, step=stride, dtype=torch.float32)
    shifts_y = torch.arange(0, h * stride, step=stride, dtype=torch.float32)
    shift_y, shift_x = torch.meshgrid(shifts_y, shifts_x, indexing="ij")
    locations = torch.stack((shift_x.reshape(-1), shift_y.reshape(-1)), dim=1)
    if offset == "half":
        locations += stride // 2
    return locations


# --------------------------------------------------------------------------
# Target preparer (tridet/modeling/dd3d/prepare_targets.py)
# --------------------------------------------------------------------------

class TorchTargetPreparer:
    """Reference DD3DTargetPreparer with the per-image python loop.

    gt_instances: list of dicts per image with keys
      boxes2d (N,4) xyxy, classes (N,) long, boxes3d (VisionBoxes3D, N).
    """

    def __init__(self, num_classes, strides, sizes_of_interest, center_sample=True, radius=1.5, dd3d_enabled=True):
        self.num_classes = num_classes
        self.strides = list(strides)
        self.center_sample = center_sample
        self.radius = radius
        self.dd3d_enabled = dd3d_enabled
        soi, prev = [], -1
        for s in sizes_of_interest:
            soi.append([prev, s])
            prev = s
        soi.append([prev, INF])
        self.sizes_of_interest = soi

    def __call__(self, locations_per_level, gt_instances):
        num_loc_list = [len(loc) for loc in locations_per_level]
        loc_to_size_range = torch.cat(
            [
                torch.tensor(self.sizes_of_interest[l], dtype=torch.float32)[None].expand(n, -1)
                for l, n in enumerate(num_loc_list)
            ]
        )
        locations = torch.cat(locations_per_level, dim=0)

        tt = self._compute_targets_for_locations(locations, gt_instances, loc_to_size_range, num_loc_list)
        nuscenes = "attributes" in gt_instances[0]
        tt["locations"] = [locations.clone() for _ in gt_instances]
        tt["im_inds"] = [torch.full((locations.shape[0],), i, dtype=torch.long) for i in range(len(gt_instances))]

        box3d = tt.pop("box3d", None)
        # image-first -> level-first (prepare_targets.py:214-235)
        out = {}
        for k, per_im in tt.items():
            chunks = [torch.split(t, num_loc_list, dim=0) for t in per_im]
            out[k] = [torch.cat(per_level, dim=0) for per_level in zip(*chunks)]
        if box3d is not None:
            chunks3d = [b.split(num_loc_list) for b in box3d]
            box3d_level_first = [VisionBoxes3D.cat(per_level) for per_level in zip(*chunks3d)]

        out["fpn_levels"] = [
            torch.full((len(loc),), lvl, dtype=torch.long) for lvl, loc in enumerate(out["locations"])
        ]

        labels = torch.cat([x.reshape(-1) for x in out["labels"]])
        box2d_reg_targets = torch.cat([x.reshape(-1, 4) for x in out["box2d_reg"]])
        target_inds = torch.cat([x.reshape(-1) for x in out["target_inds"]])
        locations_f = torch.cat([x.reshape(-1, 2) for x in out["locations"]])
        im_inds = torch.cat([x.reshape(-1) for x in out["im_inds"]])
        fpn_levels = torch.cat([x.reshape(-1) for x in out["fpn_levels"]])
        pos_inds = torch.nonzero(labels != self.num_classes).squeeze(1)

        targets = {
            "labels": labels,
            "box2d_reg_targets": box2d_reg_targets,
            "locations": locations_f,
            "target_inds": target_inds,
            "im_inds": im_inds,
            "fpn_levels": fpn_levels,
            "pos_inds": pos_inds,
        }
        if self.dd3d_enabled:
            targets["box3d_targets"] = VisionBoxes3D.cat(box3d_level_first)
        if nuscenes:
            # NuscenesDD3DTargetPreparer extension (nuscenes_dd3d.py:96-100,
            # 181-186): per-location attribute/speed targets from the matched
            # GT. NOTE the reference appends nothing for empty-GT images (its
            # training loader filters those), so callers must not pass any.
            targets["attributes"] = torch.cat([x.reshape(-1) for x in out["attributes"]])
            targets["speeds"] = torch.cat([x.reshape(-1) for x in out["speeds"]])
        return targets

    def _compute_targets_for_locations(self, locations, targets, size_ranges, num_loc_list):
        labels, box2d_reg, target_inds = [], [], []
        box3d = [] if self.dd3d_enabled else None
        attributes, speeds = [], []
        xs, ys = locations[:, 0], locations[:, 1]
        num_targets = 0
        for im_i, t in enumerate(targets):
            bboxes = t["boxes2d"]
            labels_per_im = t["classes"]
            if bboxes.numel() == 0:
                labels.append(labels_per_im.new_zeros(locations.size(0)) + self.num_classes)
                box2d_reg.append(locations.new_zeros((locations.size(0), 4)))
                target_inds.append(labels_per_im.new_zeros(locations.size(0)) - 1)
                if self.dd3d_enabled:
                    n = locations.size(0)
                    box3d.append(
                        VisionBoxes3D(
                            locations.new_zeros(n, 4), locations.new_zeros(n, 2), locations.new_zeros(n, 1),
                            locations.new_zeros(n, 3), locations.new_zeros(n, 3, 3)
                        )
                    )
                continue

            area = (bboxes[:, 2] - bboxes[:, 0]) * (bboxes[:, 3] - bboxes[:, 1])

            l = xs[:, None] - bboxes[:, 0][None]
            tt_ = ys[:, None] - bboxes[:, 1][None]
            r = bboxes[:, 2][None] - xs[:, None]
            b = bboxes[:, 3][None] - ys[:, None]
            box2d_reg_per_im = torch.stack([l, tt_, r, b], dim=2)

            if self.center_sample:
                is_in_boxes = self._get_sample_region(bboxes, num_loc_list, xs, ys)
            else:
                is_in_boxes = box2d_reg_per_im.min(dim=2)[0] > 0

            max_reg = box2d_reg_per_im.max(dim=2)[0]
            is_cared = (max_reg >= size_ranges[:, [0]]) & (max_reg <= size_ranges[:, [1]])

            loc_to_gt_area = area[None].repeat(len(locations), 1)
            loc_to_gt_area[is_in_boxes == 0] = INF
            loc_to_gt_area[is_cared == 0] = INF

            loc_min_area, loc_gt_inds = loc_to_gt_area.min(dim=1)
            box2d_reg_per_im = box2d_reg_per_im[range(len(locations)), loc_gt_inds]
            target_inds_per_im = loc_gt_inds + num_targets
            num_targets += len(bboxes)

            labels_per_im = labels_per_im[loc_gt_inds]
            labels_per_im[loc_min_area == INF] = self.num_classes

            labels.append(labels_per_im)
            box2d_reg.append(box2d_reg_per_im)
            target_inds.append(target_inds_per_im)
            if self.dd3d_enabled:
                box3d.append(t["boxes3d"][loc_gt_inds])
            if "attributes" in t:
                attributes.append(t["attributes"][loc_gt_inds])
                speeds.append(t["speeds"][loc_gt_inds])

        ret = {"labels": labels, "box2d_reg": box2d_reg, "target_inds": target_inds}
        if self.dd3d_enabled:
            ret["box3d"] = box3d
        if attributes:
            ret["attributes"] = attributes
            ret["speeds"] = speeds
        return ret

    def _get_sample_region(self, boxes, num_loc_list, loc_xs, loc_ys):
        center_x = boxes[..., [0, 2]].sum(dim=-1) * 0.5
        center_y = boxes[..., [1, 3]].sum(dim=-1) * 0.5
        num_gts = boxes.shape[0]
        K = len(loc_xs)
        boxes = boxes[None].expand(K, num_gts, 4)
        center_x = center_x[None].expand(K, num_gts)
        center_y = center_y[None].expand(K, num_gts)
        center_gt = boxes.new_zeros(boxes.shape)
        if center_x.numel() == 0 or center_x[..., 0].sum() == 0:
            return loc_xs.new_zeros(loc_xs.shape, dtype=torch.uint8)
        beg = 0
        for level, num_loc in enumerate(num_loc_list):
            end = beg + num_loc
            stride = self.strides[level] * self.radius
            xmin = center_x[beg:end] - stride
            ymin = center_y[beg:end] - stride
            xmax = center_x[beg:end] + stride
            ymax = center_y[beg:end] + stride
            center_gt[beg:end, :, 0] = torch.where(xmin > boxes[beg:end, :, 0], xmin, boxes[beg:end, :, 0])
            center_gt[beg:end, :, 1] = torch.where(ymin > boxes[beg:end, :, 1], ymin, boxes[beg:end, :, 1])
            center_gt[beg:end, :, 2] = torch.where(xmax > boxes[beg:end, :, 2], boxes[beg:end, :, 2], xmax)
            center_gt[beg:end, :, 3] = torch.where(ymax > boxes[beg:end, :, 3], boxes[beg:end, :, 3], ymax)
            beg = end
        left = loc_xs[:, None] - center_gt[..., 0]
        right = center_gt[..., 2] - loc_xs[:, None]
        top = loc_ys[:, None] - center_gt[..., 1]
        bottom = center_gt[..., 3] - loc_ys[:, None]
        center_bbox = torch.stack((left, top, right, bottom), -1)
        return center_bbox.min(-1)[0] > 0


# --------------------------------------------------------------------------
# FCOS2D loss (tridet/modeling/dd3d/fcos2d.py:159-239)
# --------------------------------------------------------------------------

def torch_fcos2d_loss(logits, box2d_reg, centerness, targets, num_classes,
                      focal_alpha=0.25, focal_gamma=2.0, loc_loss_type="giou"):
    labels = targets["labels"]
    box2d_reg_targets = targets["box2d_reg_targets"]
    pos_inds = targets["pos_inds"]

    logits = torch.cat([x.permute(0, 2, 3, 1).reshape(-1, num_classes) for x in logits])
    box2d_reg_pred = torch.cat([x.permute(0, 2, 3, 1).reshape(-1, 4) for x in box2d_reg])
    centerness_pred = torch.cat([x.permute(0, 2, 3, 1).reshape(-1) for x in centerness])

    num_pos_avg = max(float(pos_inds.numel()), 1.0)

    cls_target = torch.zeros_like(logits)
    cls_target[pos_inds, labels[pos_inds]] = 1
    loss_cls = sigmoid_focal_loss(logits, cls_target, alpha=focal_alpha, gamma=focal_gamma) / num_pos_avg

    if pos_inds.numel() == 0:
        return {
            "loss_cls": loss_cls,
            "loss_box2d_reg": box2d_reg_pred.sum() * 0.0,
            "loss_centerness": centerness_pred.sum() * 0.0,
        }, {}

    box2d_reg_pred = box2d_reg_pred[pos_inds]
    box2d_reg_targets = box2d_reg_targets[pos_inds]
    centerness_pred = centerness_pred[pos_inds]

    centerness_targets = compute_ctrness_targets(box2d_reg_targets)
    loss_denom = max(float(centerness_targets.sum()), 1e-6)

    loss_box2d_reg = iou_loss(box2d_reg_pred, box2d_reg_targets, centerness_targets, loc_loss_type) / loss_denom
    loss_centerness = F.binary_cross_entropy_with_logits(
        centerness_pred, centerness_targets, reduction="sum"
    ) / num_pos_avg

    losses = {"loss_cls": loss_cls, "loss_box2d_reg": loss_box2d_reg, "loss_centerness": loss_centerness}
    extra = {"loss_denom": loss_denom, "centerness_targets": centerness_targets}
    return losses, extra


# --------------------------------------------------------------------------
# 3D decode + disentangled loss + FCOS3D loss (fcos3d.py, disentangled_box3d_loss.py)
# --------------------------------------------------------------------------

def predictions_to_boxes3d(quat, proj_ctr, depth, size, locations, inv_intrinsics, canon_box_sizes,
                           min_depth, max_depth, scale_depth_by_focal_lengths_factor,
                           scale_depth_by_focal_lengths=True, quat_is_allocentric=True,
                           depth_is_distance=False):
    quat = quat / quat.norm(dim=1, keepdim=True).clamp(min=EPS)
    quat = quat / quat.norm(dim=1, keepdim=True)
    if scale_depth_by_focal_lengths:
        pixel_size = torch.norm(torch.stack([inv_intrinsics[:, 0, 0], inv_intrinsics[:, 1, 1]], dim=-1), dim=-1)
        depth = depth / (pixel_size * scale_depth_by_focal_lengths_factor)
    if depth_is_distance:
        depth = depth / unproject_points2d(locations, inv_intrinsics).norm(dim=1).clamp(min=EPS)
    depth = depth.reshape(-1, 1).clamp(min_depth, max_depth)
    proj_ctr = proj_ctr + locations
    if quat_is_allocentric:
        quat = allocentric_to_egocentric(quat, proj_ctr, inv_intrinsics)
    size = (size.tanh() + 1.0) * canon_box_sizes
    return VisionBoxes3D(quat, proj_ctr, depth, size, inv_intrinsics)


def disentangled_box3d_loss(box3d_pred, box3d_targets, weights, smooth_l1_beta, max_loss_per_group):
    box3d_pred = box3d_pred.to(torch.float32)
    box3d_targets = box3d_targets.to(torch.float32)
    target_corners = box3d_targets.corners

    disentangled_losses = {}
    for component_key in ["quat", "proj_ctr", "depth", "size"]:
        disentangled_boxes = box3d_targets.clone()
        setattr(disentangled_boxes, component_key, getattr(box3d_pred, component_key))
        pred_corners = disentangled_boxes.to(torch.float32).corners
        loss = smooth_l1_loss(pred_corners, target_corners, beta=smooth_l1_beta)
        # reference quirk: non-inplace clamp, result discarded (no-op)
        loss.clamp(max=max_loss_per_group)
        if weights is not None:
            loss = torch.sum(loss.reshape(-1, 24).mean(dim=1) * weights)
        else:
            loss = loss.reshape(-1, 24).mean()
        disentangled_losses["loss_box3d_" + component_key] = loss

    entangled_l1_dist = (target_corners - box3d_pred.corners).detach().abs().reshape(-1, 24).mean(dim=1)
    return disentangled_losses, entangled_l1_dist


def torch_fcos3d_loss(box3d_quat, box3d_ctr, box3d_depth, box3d_size, box3d_conf,
                      inv_intrinsics_per_im, fcos2d_info, targets, num_classes, canon_box_sizes,
                      min_depth, max_depth, scale_depth_by_focal_lengths_factor,
                      predict_allocentric_rot=True, scale_depth_by_focal_lengths=True,
                      predict_distance=False, class_agnostic=False,
                      smooth_l1_beta=0.05, max_loss_per_group=20.0,
                      box3d_loss_weight=2.0, conf3d_loss_weight=1.0, conf_3d_temperature=1.0):
    labels = targets["labels"]
    box3d_targets = targets["box3d_targets"]
    pos_inds = targets["pos_inds"]

    nc = 1 if class_agnostic else num_classes
    quat_pred = torch.cat([x.permute(0, 2, 3, 1).reshape(-1, 4, nc) for x in box3d_quat])
    ctr_pred = torch.cat([x.permute(0, 2, 3, 1).reshape(-1, 2, nc) for x in box3d_ctr])
    depth_pred = torch.cat([x.permute(0, 2, 3, 1).reshape(-1, nc) for x in box3d_depth])
    size_pred = torch.cat([x.permute(0, 2, 3, 1).reshape(-1, 3, nc) for x in box3d_size])
    conf_pred = torch.cat([x.permute(0, 2, 3, 1).reshape(-1, nc) for x in box3d_conf])

    box3d_targets = box3d_targets[pos_inds]
    quat_pred = quat_pred[pos_inds]
    ctr_pred = ctr_pred[pos_inds]
    depth_pred = depth_pred[pos_inds]
    size_pred = size_pred[pos_inds]
    conf_pred = conf_pred[pos_inds]

    if class_agnostic:
        quat_pred = quat_pred.squeeze(-1)
        ctr_pred = ctr_pred.squeeze(-1)
        depth_pred = depth_pred.squeeze(-1)
        size_pred = size_pred.squeeze(-1)
        conf_pred = conf_pred.squeeze(-1)
    else:
        I = labels[pos_inds][..., None, None]
        quat_pred = torch.gather(quat_pred, dim=2, index=I.repeat(1, 4, 1)).squeeze(-1)
        ctr_pred = torch.gather(ctr_pred, dim=2, index=I.repeat(1, 2, 1)).squeeze(-1)
        depth_pred = torch.gather(depth_pred, dim=1, index=I.squeeze(-1)).squeeze(-1)
        size_pred = torch.gather(size_pred, dim=2, index=I.repeat(1, 3, 1)).squeeze(-1)
        conf_pred = torch.gather(conf_pred, dim=1, index=I.squeeze(-1)).squeeze(-1)

    canon = quat_pred.new_tensor(canon_box_sizes)[labels[pos_inds]]
    locations = targets["locations"][pos_inds]
    im_inds = targets["im_inds"][pos_inds]
    inv_K = inv_intrinsics_per_im[im_inds]

    box3d_pred = predictions_to_boxes3d(
        quat_pred, ctr_pred, depth_pred, size_pred, locations, inv_K, canon, min_depth, max_depth,
        scale_depth_by_focal_lengths_factor=scale_depth_by_focal_lengths_factor,
        scale_depth_by_focal_lengths=scale_depth_by_focal_lengths,
        quat_is_allocentric=predict_allocentric_rot, depth_is_distance=predict_distance,
    )

    centerness_targets = fcos2d_info["centerness_targets"]
    loss_denom = fcos2d_info["loss_denom"]
    losses_box3d, box3d_l1_error = disentangled_box3d_loss(
        box3d_pred, box3d_targets, centerness_targets, smooth_l1_beta, max_loss_per_group
    )
    losses_box3d = {k: box3d_loss_weight * v / loss_denom for k, v in losses_box3d.items()}

    conf_3d_targets = torch.exp(-1.0 / conf_3d_temperature * box3d_l1_error)
    loss_conf3d = F.binary_cross_entropy_with_logits(conf_pred, conf_3d_targets, reduction="none")
    loss_conf3d = conf3d_loss_weight * (loss_conf3d * centerness_targets).sum() / loss_denom

    return {"loss_conf3d": loss_conf3d, **losses_box3d}


# --------------------------------------------------------------------------
# NuscenesLoss (tridet/modeling/dd3d/nuscenes_dd3d.py:199-265)
# --------------------------------------------------------------------------

def torch_nuscenes_loss(attr_logits, speeds, fcos2d_info, targets, max_num_attributes,
                        attr_loss_weight=0.2, speed_loss_weight=0.2):
    attr_logits = torch.cat([x.permute(0, 2, 3, 1).reshape(-1, max_num_attributes) for x in attr_logits])
    speeds = torch.cat([x.permute(0, 2, 3, 1).reshape(-1) for x in speeds])
    pos_inds = targets["pos_inds"]

    if pos_inds.numel() == 0:
        return {"loss_attr": attr_logits.sum() * 0.0, "loss_speed": speeds.sum() * 0.0}

    losses = {}

    attr_logits = attr_logits[pos_inds]
    target_attr = targets["attributes"][pos_inds]
    valid_attr_mask = target_attr != max_num_attributes

    attr_weights = fcos2d_info["centerness_targets"][valid_attr_mask]
    attr_loss_denom = max(float(attr_weights.sum()), 1e-6)

    if valid_attr_mask.sum() == 0:
        losses["loss_attr"] = attr_logits.sum() * 0.0
    else:
        attr_logits = attr_logits[valid_attr_mask]
        target_attr = target_attr[valid_attr_mask]
        # reference quirk: default MEAN reduction, then weighted
        xent = F.cross_entropy(attr_logits, target_attr)
        loss_attr = (xent * attr_weights).sum() / attr_loss_denom
        losses["loss_attr"] = attr_loss_weight * loss_attr

    speeds = speeds[pos_inds]
    target_speeds = targets["speeds"][pos_inds]
    valid_gt_mask = torch.logical_not(torch.isnan(target_speeds))

    speed_weights = fcos2d_info["centerness_targets"][valid_gt_mask]
    speed_loss_denom = max(float(speed_weights.sum()), 1e-6)

    if valid_gt_mask.sum() == 0:
        losses["loss_speed"] = speeds.sum() * 0.0
    else:
        speeds = speeds[valid_gt_mask]
        target_speeds = target_speeds[valid_gt_mask]
        l1_error = smooth_l1_loss(speeds, target_speeds, beta=0.05)
        loss_speed = (l1_error * speed_weights).sum() / speed_loss_denom
        losses["loss_speed"] = speed_loss_weight * loss_speed

    return losses
