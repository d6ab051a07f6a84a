# Supervised FCOS baseline on partially-labeled VOC
# (reference configs/fcos_semi/voc/r50_caffe_mslonger_tricks_0.Xdata.py)
_base_ = ['../r50_caffe_mslonger_tricks_0.Xdata.py']
model = dict(bbox_head=dict(num_classes=20))
