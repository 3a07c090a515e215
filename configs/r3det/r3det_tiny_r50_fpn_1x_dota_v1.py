# R3Det* ("tiny"): same as the full model but 2 stacked convs per head
# branch. Reference counterpart reproduces 70.86 box AP.
_base_ = ['./r3det_r50_fpn_1x_dota_v1.py']

model = dict(
    bbox_head=dict(stacked_convs=2),
    refine_heads=[dict(stacked_convs=2)],
)
