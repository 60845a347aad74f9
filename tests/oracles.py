"""Host numpy oracles for the device ops.

Each oracle independently re-derives the reference semantics (cited in the
op docstrings) in plain numpy/scipy, so device kernels are validated
against a second implementation rather than against themselves.
"""

import numpy as np
import scipy.linalg

STD_POS = 1.0 / 20
STD_VEL = 1.0 / 160


# ---------------------------------------------------------------------------
# IoU (+1 pixel convention, cython_bbox-style)
# ---------------------------------------------------------------------------

def iou_matrix_np(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    out = np.zeros((len(a), len(b)))
    for i, ba in enumerate(a):
        for j, bb in enumerate(b):
            iw = min(ba[2], bb[2]) - max(ba[0], bb[0]) + 1
            ih = min(ba[3], bb[3]) - max(ba[1], bb[1]) + 1
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            ua = (
                (ba[2] - ba[0] + 1) * (ba[3] - ba[1] + 1)
                + (bb[2] - bb[0] + 1) * (bb[3] - bb[1] + 1)
                - inter
            )
            out[i, j] = inter / ua
    return out


# ---------------------------------------------------------------------------
# Kalman oracles — per-track, unbatched, scipy linalg
# ---------------------------------------------------------------------------

def _stds(fmt, mean4, init):
    pw = 2 * STD_POS if init else STD_POS
    vw = 10 * STD_VEL if init else STD_VEL
    if fmt == "naive":
        h = np.sqrt(mean4[2] * mean4[3])
        return (
            [pw * h, pw * h, pw * h, 1e-5],
            [10 * STD_VEL * h] * 3,
        )
    if fmt == "botsort":
        w, h = mean4[2], mean4[3]
        return ([pw * w, pw * h, pw * w, pw * h], [vw * w, vw * h, vw * w, vw * h])
    h = mean4[3]
    return ([pw * h, pw * h, 1e-2, pw * h], [vw * h, vw * h, 1e-5, vw * h])


def kf_dims(fmt):
    return 7 if fmt == "naive" else 8


def kf_motion(fmt):
    if fmt == "naive":
        f = np.eye(7)
        f[0, 4] = f[1, 5] = f[2, 6] = 1
        return f
    f = np.eye(8)
    for i in range(4):
        f[i, 4 + i] = 1
    return f


def kf_initiate(fmt, meas):
    n = kf_dims(fmt)
    mean = np.zeros(n)
    mean[:4] = meas
    pos, vel = _stds(fmt, meas, init=True)
    std = pos + vel
    cov = np.diag(np.square(np.asarray(std)))
    return mean, cov


def kf_predict(fmt, mean, cov):
    pos, vel = _stds(fmt, mean[:4], init=False)
    q = np.diag(np.square(np.asarray(pos + vel)))
    f = kf_motion(fmt)
    return f @ mean, f @ cov @ f.T + q


def _meas_std(fmt, mean4, conf=None):
    if fmt == "naive":
        h = np.sqrt(mean4[2] * mean4[3])
        std = [STD_POS * h, STD_POS * h, 1e-1, STD_POS * h]
    elif fmt == "botsort":
        w, h = mean4[2], mean4[3]
        std = [STD_POS * w, STD_POS * h, STD_POS * w, STD_POS * h]
    else:
        h = mean4[3]
        std = [STD_POS * h, STD_POS * h, 1e-1, STD_POS * h]
    std = np.asarray(std)
    if conf is not None:
        std = std * (1 - conf)
    return std


def kf_update(fmt, mean, cov, meas, conf=None):
    n = kf_dims(fmt)
    hmat = np.eye(4, n)
    r = np.diag(np.square(_meas_std(fmt, mean[:4], conf)))
    proj_mean = hmat @ mean
    proj_cov = hmat @ cov @ hmat.T + r
    chol, low = scipy.linalg.cho_factor(proj_cov, lower=True)
    gain = scipy.linalg.cho_solve((chol, low), (cov @ hmat.T).T).T
    innov = meas - proj_mean
    new_mean = mean + gain @ innov
    new_cov = cov - gain @ proj_cov @ gain.T
    return new_mean, new_cov


def kf_gating(fmt, mean, cov, measurements, only_position=False):
    n = kf_dims(fmt)
    hmat = np.eye(4, n)
    r = np.diag(np.square(_meas_std(fmt, mean[:4])))
    proj_mean = hmat @ mean
    proj_cov = hmat @ cov @ hmat.T + r
    if only_position:
        proj_mean, proj_cov = proj_mean[:2], proj_cov[:2, :2]
        measurements = measurements[:, :2]
    d = measurements - proj_mean
    chol = np.linalg.cholesky(proj_cov)
    z = scipy.linalg.solve_triangular(chol, d.T, lower=True)
    return np.sum(z * z, axis=0)


# ---------------------------------------------------------------------------
# NMS oracle — reference non_max_suppression semantics, numpy
# ---------------------------------------------------------------------------

def nms_np(pred, conf_thres, iou_thres, max_det=300, multi_label=False,
           agnostic=False, max_wh=4096.0):
    pred = np.asarray(pred, np.float64)
    nc = pred.shape[1] - 5
    x = pred[pred[:, 4] > conf_thres]
    if x.shape[0] == 0:
        return np.zeros((0, 6))
    cls_conf = x[:, 5:] * x[:, 4:5]
    box = np.stack(
        [
            x[:, 0] - x[:, 2] / 2,
            x[:, 1] - x[:, 3] / 2,
            x[:, 0] + x[:, 2] / 2,
            x[:, 1] + x[:, 3] / 2,
        ],
        axis=1,
    )
    if multi_label and nc > 1:
        i, j = np.nonzero(cls_conf > conf_thres)
        x = np.concatenate(
            [box[i], cls_conf[i, j, None], j[:, None].astype(np.float64)], axis=1
        )
    else:
        conf = cls_conf.max(1)
        j = cls_conf.argmax(1)
        x = np.concatenate([box, conf[:, None], j[:, None].astype(np.float64)], 1)
        x = x[conf > conf_thres]
    if x.shape[0] == 0:
        return np.zeros((0, 6))
    offs = 0.0 if agnostic else x[:, 5:6] * max_wh
    obox = x[:, :4] + offs
    order = np.argsort(-x[:, 4], kind="stable")
    keep = []
    alive = np.ones(len(x), bool)
    for idx in order:
        if not alive[idx]:
            continue
        keep.append(idx)
        if len(keep) >= max_det:
            break
        bx = obox[idx]
        iw = np.maximum(
            np.minimum(bx[2], obox[:, 2]) - np.maximum(bx[0], obox[:, 0]), 0
        )
        ih = np.maximum(
            np.minimum(bx[3], obox[:, 3]) - np.maximum(bx[1], obox[:, 1]), 0
        )
        inter = iw * ih
        area = (bx[2] - bx[0]) * (bx[3] - bx[1])
        areas = (obox[:, 2] - obox[:, 0]) * (obox[:, 3] - obox[:, 1])
        iou = inter / (area + areas - inter + 1e-7)
        alive &= iou <= iou_thres
    return x[keep]
