"""Independent PyTorch oracle for parity testing.

A from-scratch torch implementation of the UC2 forward semantics (written
against the *behavior* documented in SURVEY.md §2.1/§3.3, not copied from the
reference), with state_dict key names matching the reference checkpoint format
so it exercises models/convert.py end-to-end:

  roberta.embeddings.{word,position,new_token_type}_embeddings / LayerNorm
  roberta.img_embeddings.{img_linear,pos_linear,img_layer_norm,pos_layer_norm,
                          LayerNorm,mask_embedding}
  roberta.encoder.layer.{i}.attention.self.{query,key,value} /
      attention.output.{dense,LayerNorm} / intermediate.dense /
      output.{dense,LayerNorm}
  roberta.pooler.dense
  cls.{dense,layer_norm,bias}   feat_regress.{net.0,net.2,bias}
  region_classifier.net.{0,2,3} itm_output  rank_output  vqa_output.{0,2,3}
"""

import math

import torch
from torch import nn
import torch.nn.functional as F


def t_gelu(x):
    return x * 0.5 * (1.0 + torch.erf(x / math.sqrt(2.0)))


def make_positions(input_ids, pad):
    mask = input_ids.ne(pad).int()
    return (torch.cumsum(mask, 1).type_as(mask) * mask).long() + pad


class OracleEncoderLayer(nn.Module):
    def __init__(self, h, n, ffn, eps_block=1e-12, p=0.0):
        super().__init__()
        self.n = n
        self.d = h // n
        self.attention = nn.Module()
        self.attention.self = nn.Module()
        self.attention.self.query = nn.Linear(h, h)
        self.attention.self.key = nn.Linear(h, h)
        self.attention.self.value = nn.Linear(h, h)
        self.attention.output = nn.Module()
        self.attention.output.dense = nn.Linear(h, h)
        self.attention.output.LayerNorm = nn.LayerNorm(h, eps=eps_block)
        self.intermediate = nn.Module()
        self.intermediate.dense = nn.Linear(h, ffn)
        self.output = nn.Module()
        self.output.dense = nn.Linear(ffn, h)
        self.output.LayerNorm = nn.LayerNorm(h, eps=eps_block)

    def forward(self, x, bias):
        B, L, H = x.shape
        s = self.attention.self
        q = s.query(x).view(B, L, self.n, self.d).transpose(1, 2)
        k = s.key(x).view(B, L, self.n, self.d).transpose(1, 2)
        v = s.value(x).view(B, L, self.n, self.d).transpose(1, 2)
        scores = q @ k.transpose(-1, -2) / math.sqrt(self.d) + bias
        ctx = (scores.softmax(-1) @ v).transpose(1, 2).reshape(B, L, H)
        x = self.attention.output.LayerNorm(
            self.attention.output.dense(ctx) + x)
        h = t_gelu(self.intermediate.dense(x))
        x = self.output.LayerNorm(self.output.dense(h) + x)
        return x


class OracleUC2(nn.Module):
    def __init__(self, vocab=1000, h=64, n_layers=2, n_heads=4, ffn=128,
                 max_pos=66, type_vocab=2, img_dim=32, img_label_dim=11,
                 eps=1e-5, eps_block=1e-12, pad=1, num_answer=7):
        super().__init__()
        self.pad = pad
        self.h = h
        self.roberta = nn.Module()
        emb = nn.Module()
        emb.word_embeddings = nn.Embedding(vocab, h, padding_idx=pad)
        emb.position_embeddings = nn.Embedding(max_pos, h, padding_idx=pad)
        emb.new_token_type_embeddings = nn.Embedding(type_vocab, h)
        emb.LayerNorm = nn.LayerNorm(h, eps=eps)
        self.roberta.embeddings = emb
        ie = nn.Module()
        ie.img_linear = nn.Linear(img_dim, h)
        ie.pos_linear = nn.Linear(7, h)
        ie.img_layer_norm = nn.LayerNorm(h, eps=eps)
        ie.pos_layer_norm = nn.LayerNorm(h, eps=eps)
        ie.LayerNorm = nn.LayerNorm(h, eps=eps)
        ie.mask_embedding = nn.Embedding(2, img_dim, padding_idx=0)
        self.roberta.img_embeddings = ie
        enc = nn.Module()
        enc.layer = nn.ModuleList(
            [OracleEncoderLayer(h, n_heads, ffn, eps_block)
             for _ in range(n_layers)])
        self.roberta.encoder = enc
        pooler = nn.Module()
        pooler.dense = nn.Linear(h, h)
        self.roberta.pooler = pooler
        # heads
        self.cls = nn.Module()
        self.cls.dense = nn.Linear(h, h)
        self.cls.layer_norm = nn.LayerNorm(h, eps=eps)
        self.cls.bias = nn.Parameter(torch.zeros(vocab))
        self.feat_regress = nn.Module()
        self.feat_regress.net = nn.ModuleList(
            [nn.Linear(h, h), nn.Identity(), nn.LayerNorm(h, eps=1e-12)])
        self.feat_regress.bias = nn.Parameter(torch.zeros(img_dim))
        self.region_classifier = nn.Module()
        self.region_classifier.net = nn.ModuleList(
            [nn.Linear(h, h), nn.Identity(), nn.LayerNorm(h, eps=1e-12),
             nn.Linear(h, img_label_dim)])
        self.itm_output = nn.Linear(h, 2)
        self.rank_output = nn.Linear(h, 1)
        self.vqa_output = nn.ModuleList(
            [nn.Linear(h, 2 * h), nn.Identity(), nn.LayerNorm(2 * h, eps=eps),
             nn.Linear(2 * h, num_answer)])

    def encode(self, input_ids, img_feat, img_pos_feat, attn_mask,
               position_ids=None, img_masks=None):
        emb = self.roberta.embeddings
        if position_ids is None:
            position_ids = make_positions(input_ids, self.pad)
        txt = (emb.word_embeddings(input_ids)
               + emb.position_embeddings(position_ids)
               + emb.new_token_type_embeddings(torch.zeros_like(input_ids)))
        txt = emb.LayerNorm(txt)
        ie = self.roberta.img_embeddings
        if img_masks is not None:
            with torch.no_grad():
                ie.mask_embedding.weight[0].fill_(0)
            img_feat = img_feat + ie.mask_embedding(img_masks.long())
        img = (ie.img_layer_norm(ie.img_linear(img_feat))
               + ie.pos_layer_norm(ie.pos_linear(img_pos_feat))
               + emb.new_token_type_embeddings(
                   torch.ones(img_feat.shape[:2], dtype=torch.long)))
        img = ie.LayerNorm(img)
        x = torch.cat([txt, img], dim=1)
        bias = (1.0 - attn_mask.float())[:, None, None, :] * -10000.0
        for layer in self.roberta.encoder.layer:
            x = layer(x, bias)
        pooled = torch.tanh(self.roberta.pooler.dense(x[:, 0]))
        return x, pooled

    def lm_logits(self, h):
        x = self.cls.layer_norm(t_gelu(self.cls.dense(h)))
        return F.linear(x, self.roberta.embeddings.word_embeddings.weight,
                        self.cls.bias)

    def region_feat(self, h):
        x = self.feat_regress.net[2](t_gelu(self.feat_regress.net[0](h)))
        return F.linear(x, self.roberta.img_embeddings.img_linear.weight.t(),
                        self.feat_regress.bias)

    def region_logits(self, h):
        net = self.region_classifier.net
        return net[3](net[2](t_gelu(net[0](h))))

    def vqa_logits(self, pooled):
        net = self.vqa_output
        return net[3](net[2](t_gelu(net[0](pooled))))
