checkpoint_config = dict(interval=1)
log_config = dict(interval=10)
custom_hooks = []
log_level = 'INFO'
load_from = None
resume_from = None
workflow = [('train', 1)]
