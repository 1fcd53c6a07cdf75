weight = 'exp/synthetic/shtest/model/model_best'
resume = False
evaluate = True
test_only = False
seed = 0
save_path = 'exp/synthetic/shtest'
num_worker = 0
batch_size = 8
batch_size_val = None
batch_size_test = None
epoch = 2
eval_epoch = 2
clip_grad = None
sync_bn = False
enable_amp = True
amp_dtype = 'bfloat16'
empty_cache = False
find_unused_parameters = False
mix_prob = 0.8
param_dicts = [{'keyword': 'block', 'lr': 0.0002}]
point_capacity = 8192
point_capacity_val = 8192
hooks = [{'type': 'CheckpointLoader'},
 {'type': 'IterationTimer', 'warmup_iter': 2},
 {'type': 'InformationWriter'},
 {'type': 'SemSegEvaluator'},
 {'type': 'CheckpointSaver', 'save_freq': None}]
train = {'type': 'DefaultTrainer'}
test = {'type': 'SemSegTester', 'verbose': True}
model = {'type': 'DefaultSegmentorV2',
 'num_classes': 13,
 'backbone_out_channels': 16,
 'backbone': {'type': 'PT-v3m1',
              'in_channels': 6,
              'order': ('z', 'z-trans', 'hilbert', 'hilbert-trans'),
              'stride': (2, 2),
              'enc_depths': (1, 1, 1),
              'enc_channels': (16, 32, 64),
              'enc_num_head': (2, 4, 8),
              'enc_patch_size': (128, 128, 128),
              'dec_depths': (1, 1),
              'dec_channels': (16, 32),
              'dec_num_head': (2, 4),
              'dec_patch_size': (128, 128),
              'mlp_ratio': 2,
              'drop_path': 0.1,
              'shuffle_orders': True,
              'serialize_depth': 10,
              'pool_capacity_factors': (0.5, 0.5)},
 'criteria': [{'type': 'CrossEntropyLoss', 'loss_weight': 1.0, 'ignore_index': -1},
              {'type': 'LovaszLoss', 'mode': 'multiclass', 'loss_weight': 1.0, 'ignore_index': -1}]}
optimizer = {'type': 'AdamW', 'lr': 0.002, 'weight_decay': 0.02}
scheduler = {'type': 'OneCycleLR',
 'max_lr': [0.002, 0.0002],
 'pct_start': 0.05,
 'anneal_strategy': 'cos',
 'div_factor': 10.0,
 'final_div_factor': 1000.0}
dataset_type = 'SyntheticSemSegDataset'
data = {'num_classes': 13,
 'ignore_index': -1,
 'names': ['class_0',
           'class_1',
           'class_2',
           'class_3',
           'class_4',
           'class_5',
           'class_6',
           'class_7',
           'class_8',
           'class_9',
           'class_10',
           'class_11',
           'class_12'],
 'train': {'type': 'SyntheticSemSegDataset',
           'split': 'train',
           'num_scenes': 16,
           'num_points': 6000,
           'num_classes': 13,
           'transform': [{'type': 'CenterShift', 'apply_z': True},
                         {'type': 'RandomDropout',
                          'dropout_ratio': 0.2,
                          'dropout_application_ratio': 0.2},
                         {'type': 'RandomRotate',
                          'angle': [-1, 1],
                          'axis': 'z',
                          'center': [0, 0, 0],
                          'p': 0.5},
                         {'type': 'RandomScale', 'scale': [0.9, 1.1]},
                         {'type': 'RandomFlip', 'p': 0.5},
                         {'type': 'RandomJitter', 'sigma': 0.005, 'clip': 0.02},
                         {'type': 'ChromaticJitter', 'p': 0.95, 'std': 0.05},
                         {'type': 'GridSample',
                          'grid_size': 0.05,
                          'hash_type': 'fnv',
                          'mode': 'train',
                          'return_grid_coord': True},
                         {'type': 'SphereCrop', 'point_max': 4000, 'mode': 'random'},
                         {'type': 'CenterShift', 'apply_z': False},
                         {'type': 'NormalizeColor'},
                         {'type': 'ToTensor'},
                         {'type': 'Collect',
                          'keys': ('coord', 'grid_coord', 'segment'),
                          'feat_keys': ('color', 'normal')}],
           'test_mode': False,
           'loop': 1},
 'val': {'type': 'SyntheticSemSegDataset',
         'split': 'val',
         'num_scenes': 8,
         'num_points': 6000,
         'num_classes': 13,
         'seed_offset': 100,
         'transform': [{'type': 'CenterShift', 'apply_z': True},
                       {'type': 'GridSample',
                        'grid_size': 0.05,
                        'hash_type': 'fnv',
                        'mode': 'train',
                        'return_grid_coord': True},
                       {'type': 'CenterShift', 'apply_z': False},
                       {'type': 'NormalizeColor'},
                       {'type': 'ToTensor'},
                       {'type': 'Collect',
                        'keys': ('coord', 'grid_coord', 'segment'),
                        'feat_keys': ('color', 'normal')}],
         'test_mode': False},
 'test': {'type': 'SyntheticSemSegDataset',
          'split': 'val',
          'num_scenes': 4,
          'num_points': 6000,
          'num_classes': 13,
          'seed_offset': 100,
          'transform': [{'type': 'CenterShift', 'apply_z': True}, {'type': 'NormalizeColor'}],
          'test_mode': True,
          'test_cfg': {'voxelize': {'type': 'GridSample',
                                    'grid_size': 0.05,
                                    'hash_type': 'fnv',
                                    'mode': 'test',
                                    'return_grid_coord': True},
                       'crop': None,
                       'post_transform': [{'type': 'CenterShift', 'apply_z': False},
                                          {'type': 'ToTensor'},
                                          {'type': 'Collect',
                                           'keys': ('coord', 'grid_coord', 'index'),
                                           'feat_keys': ('color', 'normal')}],
                       'aug_transform': [[{'type': 'RandomRotateTargetAngle',
                                           'angle': [0],
                                           'axis': 'z',
                                           'center': [0, 0, 0],
                                           'p': 1}]]}}}
