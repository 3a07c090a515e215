"""Rotated-box visualization (host, cv2).

Re-provides `imshow_det_rbboxes` (reference core/visualization/image.py:
10-69) and the detector `show_result` drawing path (r3det.py:149-232):
(cx, cy, w, h, theta[, score]) boxes -> 4-corner contours drawn on the
image with class/score captions.
"""
import cv2
import numpy as np

from .rtransforms_np import obb2poly_np_v1

PALETTE = [(54, 67, 244), (99, 30, 233), (176, 39, 156), (183, 58, 103),
           (181, 81, 63), (243, 150, 33), (212, 188, 0), (136, 150, 0),
           (80, 175, 76), (74, 195, 139), (57, 220, 205), (59, 235, 255),
           (0, 152, 255), (34, 87, 255), (72, 85, 121), (180, 180, 180)]


def imshow_det_rbboxes(img, bboxes, labels, class_names=None,
                       score_thr=0.3, thickness=2, font_scale=0.5,
                       show=False, out_file=None):
    """Draw rotated detections.

    Args:
      img: path or BGR ndarray.
      bboxes: (n, 5) or (n, 6) with score column.
      labels: (n,) int class ids.
    """
    if isinstance(img, str):
        img = cv2.imread(img)
    img = np.ascontiguousarray(img)
    bboxes = np.asarray(bboxes, np.float32).reshape(-1, bboxes.shape[-1])
    labels = np.asarray(labels).reshape(-1)
    if bboxes.shape[-1] == 6 and score_thr > 0:
        keep = bboxes[:, 5] >= score_thr
        bboxes = bboxes[keep]
        labels = labels[keep]
    if bboxes.shape[-1] == 5:
        bboxes = np.concatenate(
            [bboxes, np.ones((len(bboxes), 1), np.float32)], -1)
    polys = obb2poly_np_v1(bboxes)[:, :8].reshape(-1, 4, 2)
    for poly, box, label in zip(polys, bboxes, labels):
        color = PALETTE[int(label) % len(PALETTE)]
        cv2.drawContours(img, [poly.astype(np.int32)], 0, color, thickness)
        caption = class_names[int(label)] if class_names else str(int(label))
        if box.shape[-1] == 6:
            caption += f'|{box[5]:.02f}'
        cv2.putText(img, caption, (int(poly[0, 0]), int(poly[0, 1]) - 3),
                    cv2.FONT_HERSHEY_COMPLEX, font_scale, color)
    if out_file:
        cv2.imwrite(out_file, img)
    if show:  # pragma: no cover - needs display
        cv2.imshow('dets', img)
        cv2.waitKey(0)
    return img
