# 1x schedule: 12 epochs, SGD, step decay at epochs 8 and 11.
evaluation = dict(interval=12, metric='mAP')
optimizer = dict(type='SGD', lr=2.5e-3, momentum=0.9, weight_decay=1e-4)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(
    policy='step',
    warmup='linear',
    warmup_iters=500,
    warmup_ratio=1.0 / 3,
    step=[8, 11])
runner = dict(type='EpochBasedRunner', max_epochs=12)
checkpoint_config = dict(interval=12)
