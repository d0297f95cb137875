"""Torch-CPU baseline for the north-star comparison.

BASELINE.json's target is ">=5x Torch-CPU frames/sec for the full ROVR RL
train step on 1 TPU v5e chip". The reference itself cannot run here (its
`video_processor.py` module is missing from the repo and the lpips /
torchvision packages are not installed), so this is a freshly written
torch.nn twin of the SAME computation our jitted train step performs, with
the reference's shapes (SURVEY.md §2):

  per train step (one episode, vid_length=20 frames of 3x256x256):
    * initial per-frame LPIPS baseline over all 20 frames (rovr.py:84)
    * ResNet-50 encode of all 20 frames to build the state (rovr.py:106-107)
    * T=20 rollout steps, each: policy-2 forward over the state canvas,
      UNet inpaint of target+2 contexts, UNet inpaint for the sequential
      baseline, LPIPS(VGG) reward, ResNet re-encode of the written frame
      (rovr.py:116-209)
    * PPO: 5 epochs x (critic fwd+bwd, actor logprob fwd+bwd) over the
      T-step trajectory (rovr.py:281-337)

Run:  python benchmarks/torch_baseline.py [--steps 2] [--vid_length 20]
Writes benchmarks/torch_cpu_baseline.json consumed by bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import time

import torch
import torch.nn as nn
import torch.nn.functional as F


class LocalUNet(nn.Module):
    """local_net.py:12-39 shapes (without the dead, never-applied BN)."""

    def __init__(self):
        super().__init__()
        c = [9, 64, 128, 256, 512]
        self.enc = nn.ModuleList(
            [nn.Conv2d(c[i], c[i + 1], 3, padding=1) for i in range(4)]
        )
        self.up = nn.ModuleList(
            [nn.ConvTranspose2d(512, 256, 2, 2),
             nn.ConvTranspose2d(256, 128, 2, 2),
             nn.ConvTranspose2d(128, 64, 2, 2)]
        )
        self.dec = nn.ModuleList(
            [nn.Conv2d(512, 256, 3, padding=1),
             nn.Conv2d(256, 128, 3, padding=1),
             nn.Conv2d(128, 64, 3, padding=1)]
        )
        self.head = nn.Conv2d(64, 3, 1)

    def forward(self, x, ctx):
        x = torch.cat([x, ctx[:, 0], ctx[:, 1]], dim=1)
        x1 = F.relu(self.enc[0](x))
        x2 = F.relu(self.enc[1](F.max_pool2d(x1, 2)))
        x3 = F.relu(self.enc[2](F.max_pool2d(x2, 2)))
        x4 = F.relu(self.enc[3](F.max_pool2d(x3, 2)))
        y = F.relu(self.up[0](x4))
        y = F.relu(self.dec[0](torch.cat([y, x3], dim=1)))
        y = F.relu(self.up[1](y))
        y = F.relu(self.dec[1](torch.cat([y, x2], dim=1)))
        y = F.relu(self.up[2](y))
        y = F.relu(self.dec[2](torch.cat([y, x1], dim=1)))
        return torch.sigmoid(self.head(y))


class VGGLpips(nn.Module):
    """lpips.LPIPS(net='vgg') compute: VGG16 trunk, 5 taps, unit-normalized
    squared diffs, 1x1 lin weights, spatial mean, layer sum."""

    def __init__(self):
        super().__init__()
        plan = [(3, 64, 2), (64, 128, 2), (128, 256, 3), (256, 512, 3), (512, 512, 3)]
        stages = []
        for cin, cout, n in plan:
            convs = []
            for i in range(n):
                convs.append(nn.Conv2d(cin if i == 0 else cout, cout, 3, padding=1))
                convs.append(nn.ReLU())
            stages.append(nn.Sequential(*convs))
        self.stages = nn.ModuleList(stages)
        self.lins = nn.ParameterList(
            [nn.Parameter(torch.rand(c) * 0.1) for c in (64, 128, 256, 512, 512)]
        )

    def forward(self, x, y):
        z = torch.cat([x, y], dim=0)
        b = x.shape[0]
        total = torch.zeros(b)
        for i, stage in enumerate(self.stages):
            z = stage(z)
            fx, fy = z[:b], z[b:]
            fx = fx / (fx.square().sum(1, keepdim=True).sqrt() + 1e-10)
            fy = fy / (fy.square().sum(1, keepdim=True).sqrt() + 1e-10)
            diff = (fx - fy).square()
            total = total + (diff * self.lins[i].abs()[None, :, None, None]).sum(1).mean((1, 2))
            if i < 4:
                z = F.max_pool2d(z, 2)
        return total


class Bottleneck(nn.Module):
    def __init__(self, cin, feats, stride):
        super().__init__()
        self.c1 = nn.Conv2d(cin, feats, 1, bias=False)
        self.b1 = nn.BatchNorm2d(feats)
        self.c2 = nn.Conv2d(feats, feats, 3, stride=stride, padding=1, bias=False)
        self.b2 = nn.BatchNorm2d(feats)
        self.c3 = nn.Conv2d(feats, feats * 4, 1, bias=False)
        self.b3 = nn.BatchNorm2d(feats * 4)
        self.down = None
        if stride != 1 or cin != feats * 4:
            self.down = nn.Sequential(
                nn.Conv2d(cin, feats * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(feats * 4),
            )

    def forward(self, x):
        r = x if self.down is None else self.down(x)
        y = F.relu(self.b1(self.c1(x)))
        y = F.relu(self.b2(self.c2(y)))
        y = self.b3(self.c3(y))
        return F.relu(y + r)


class ResNet50(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        blocks = []
        cin, feats = 64, 64
        for stage, n in enumerate((3, 4, 6, 3)):
            for b in range(n):
                stride = 2 if stage > 0 and b == 0 else 1
                blocks.append(Bottleneck(cin, feats, stride))
                cin = feats * 4
            feats *= 2
        self.blocks = nn.Sequential(*blocks)

    def forward(self, x):
        x = F.max_pool2d(F.relu(self.bn1(self.conv1(x))), 3, 2, 1)
        x = self.blocks(x)
        return x.mean((2, 3))


class PolicyNet2(nn.Module):
    """policy_net_2.py:41-69 shapes: video_conv over (1,160,160) -> 1024,
    concat 1024-d target feature -> final_fc 2048->...->20."""

    def __init__(self, out=20):
        super().__init__()
        self.convs = nn.ModuleList(
            [nn.Conv2d(1, 64, 3, padding=1), nn.Conv2d(64, 128, 3, padding=1),
             nn.Conv2d(128, 256, 3, padding=1), nn.Conv2d(256, 512, 3, padding=1)]
        )
        self.bns = nn.ModuleList([nn.BatchNorm2d(c) for c in (64, 128, 256, 512)])
        dims = [2048, 1024, 512, 256, 64, out]
        self.fc = nn.Sequential(
            *[nn.Linear(dims[i], dims[i + 1]) for i in range(len(dims) - 1)]
        )

    def forward(self, canvas, feat):
        x = F.max_pool2d(F.relu(self.bns[0](self.convs[0](canvas))), 8)
        x = F.max_pool2d(F.relu(self.bns[1](self.convs[1](x))), 4)
        x = F.relu(self.bns[2](self.convs[2](x)))
        x = F.relu(self.bns[3](self.convs[3](x)))
        x = F.max_pool2d(x, 2, (2, 1))
        x = F.max_pool2d(x, 2, 2)
        x = x.flatten(1)
        return self.fc(torch.cat([x, feat], dim=1))


def run_step(nets, video, org, vid_length, ppo_epochs):
    unet, lpips, resnet, actor, critic, proj, a_opt, c_opt = nets
    b, s = video.shape[:2]
    t_steps = vid_length

    with torch.no_grad():
        # initial per-frame LPIPS baseline (rovr.py:84)
        lpips(video.flatten(0, 1), org.flatten(0, 1))
        # encode state (rovr.py:106-107)
        frames224 = F.interpolate(video.flatten(0, 1), (224, 224), mode="bilinear")
        pooled = resnet(frames224)
        feats = proj(pooled).reshape(b, s, -1)
        canvas = torch.rand(b, 1, 160, 160)

        obs_c, obs_f = [], []
        recon = video.clone()
        exp = video.clone()
        for t in range(t_steps):
            logits = actor(canvas, feats[:, t % s])
            top2 = logits.topk(2, dim=1).indices
            tgt = recon[:, t % s]
            ctx = torch.stack([recon[torch.arange(b), top2[:, 0]],
                               recon[torch.arange(b), top2[:, 1]]], dim=1)
            y_hat = unet(tgt, ctx)
            # sequential baseline (rovr.py:164-175)
            e_ctx = torch.stack([exp[:, max(t - 1, 0)], exp[:, max(t - 2, 0)]], dim=1)
            e_hat = unet(exp[:, t % s], e_ctx)
            lpips(y_hat, org[:, t % s])  # reward
            recon[:, t % s] = y_hat
            exp[:, t % s] = e_hat
            # re-encode the written frame's tile (rovr.py:196-200)
            resized = F.interpolate(y_hat, (224, 224), mode="bilinear")
            proj(resnet(resized))
            obs_c.append(canvas.clone())
            obs_f.append(feats[:, t % s])

    # PPO (rovr.py:281-337): 5 epochs of separate actor/critic Adam steps
    oc = torch.cat(obs_c, dim=0)
    of = torch.cat(obs_f, dim=0)
    rtg = torch.randn(oc.shape[0])
    acts = torch.randint(0, 20, (oc.shape[0], 2))
    for _ in range(ppo_epochs):
        v = critic(oc, of)[:, 0]
        adv = (rtg - v.detach())
        adv = (adv - adv.mean()) / (adv.std() + 1e-10)
        probs = F.softmax(actor(oc, of), dim=1)
        logp = (probs.gather(1, acts[:, :1]).log() + probs.gather(1, acts[:, 1:]).log())[:, 0] / 2
        a_loss = -(logp.exp() * adv).clamp(-10, 10).mean()
        a_opt.zero_grad(); a_loss.backward(); a_opt.step()
        c_loss = F.mse_loss(critic(oc, of)[:, 0], rtg)
        c_opt.zero_grad(); c_loss.backward(); c_opt.step()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2)
    p.add_argument("--vid_length", type=int, default=20)
    p.add_argument("--ppo_epochs", type=int, default=5)
    p.add_argument("--size", type=int, default=256)
    args = p.parse_args()

    torch.manual_seed(0)
    unet = LocalUNet()
    lpips = VGGLpips()
    resnet = ResNet50().eval()
    actor = PolicyNet2(20)
    critic = PolicyNet2(1)
    proj = nn.Linear(2048, 1024)
    a_opt = torch.optim.Adam(actor.parameters(), lr=2e-4)
    c_opt = torch.optim.Adam(critic.parameters(), lr=2e-4)
    nets = (unet, lpips, resnet, actor, critic, proj, a_opt, c_opt)

    s = args.vid_length
    video = torch.rand(1, s, 3, args.size, args.size)
    org = torch.rand(1, s, 3, args.size, args.size)

    # warmup
    run_step(nets, video, org, args.vid_length, args.ppo_epochs)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        run_step(nets, video, org, args.vid_length, args.ppo_epochs)
    dt = (time.perf_counter() - t0) / args.steps
    fps = args.vid_length / dt

    out = {
        "frames_per_sec": fps,
        "sec_per_step": dt,
        "vid_length": args.vid_length,
        "ppo_epochs": args.ppo_epochs,
        "frame_size": args.size,
        "torch_version": torch.__version__,
        "cpu": platform.processor() or platform.machine(),
        "num_threads": torch.get_num_threads(),
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    path = os.path.join(os.path.dirname(__file__), "torch_cpu_baseline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
