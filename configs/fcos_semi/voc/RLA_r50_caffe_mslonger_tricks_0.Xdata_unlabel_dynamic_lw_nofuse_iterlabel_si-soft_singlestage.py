# Canonical reference filename for the VOC DSL semi config
# (reference configs/fcos_semi/voc/RLA_r50_caffe_mslonger_tricks_0.Xdata_unlabel_dynamic_lw_nofuse_iterlabel_si-soft_singlestage.py)
_base_ = ['RLA_r50_fcos_semi_voc.py']
