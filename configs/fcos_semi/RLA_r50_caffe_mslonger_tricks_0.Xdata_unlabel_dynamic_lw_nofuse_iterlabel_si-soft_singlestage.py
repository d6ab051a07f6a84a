# Canonical reference filename for the flagship DSL semi config
# (reference configs/fcos_semi/RLA_r50_caffe_mslonger_tricks_0.Xdata_unlabel_dynamic_lw_nofuse_iterlabel_si-soft_singlestage.py)
_base_ = ['RLA_r50_fcos_semi_dsl.py']
