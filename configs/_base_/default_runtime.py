# Runtime defaults: logging + distributed init + resume knobs.
log_config = dict(interval=50, hooks=[dict(type='TextLoggerHook')])
dist_params = dict(backend='ici')   # jax: ICI within a slice, DCN across
log_level = 'INFO'
load_from = None
resume_from = None
workflow = [('train', 1)]
