# DSL semi config for the VOC07(+12) protocol
# (parity: configs/fcos_semi/voc/RLA_r50_caffe_mslonger_tricks_...voc.py)
_base_ = ['../RLA_r50_fcos_semi_dsl.py']

model = dict(bbox_head=dict(num_classes=20))

data_root = 'data/semivoc/'
data = dict(
    train=dict(
        type='SemiVOCDataset',
        ann_file=data_root + 'prepared_annos/Industry/train_list.txt',
        ann_path=data_root + 'prepared_annos/Industry/annotations/full/',
        labelmapper=data_root + 'mmdet_category_info.json',
        img_prefix=data_root + 'images/full/'),
    unlabel_train=dict(
        type='SemiVOCDataset',
        ann_file=data_root + 'unlabel_prepared_annos/Industry/train_list.txt',
        ann_path=data_root + 'unlabel_prepared_annos/Industry/annotations/full/',
        labelmapper=data_root + 'mmdet_category_info.json',
        img_prefix=data_root + 'unlabel_images/full/',
        thres='adathres.json'),
    unlabel_pred=dict(
        image_root_path=data_root + 'unlabel_images/full/',
        anno_root_path=data_root + 'unlabel_prepared_annos/Industry/annotations/full/',
        category_info_path=data_root + 'mmdet_category_info.json'),
    val=dict(
        _delete_=True,
        type='Voc2CocoDataset',
        ann_file=data_root + 'VOC2007/ImageSets/Main/test.txt',
        img_prefix=data_root + 'VOC2007/'),
    test=dict(
        _delete_=True,
        type='Voc2CocoDataset',
        ann_file=data_root + 'VOC2007/ImageSets/Main/test.txt',
        img_prefix=data_root + 'VOC2007/'))
