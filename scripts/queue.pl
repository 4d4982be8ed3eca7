#!/usr/bin/env perl
# Cluster-dispatch stand-in: this environment has no grid engine, so
# queue.pl delegates to the local run.pl with the same calling convention
# (Kaldi scripts select the dispatcher via $cmd, reference cmd.sh:12-15).
# Replace with a real SGE/Slurm wrapper for cluster use.
use strict;
use warnings;
use FindBin;
warn "queue.pl: no grid engine configured; running locally via run.pl\n";
# strip scheduler resource options like -q all.q or --mem 4G
my @args;
while (@ARGV and $ARGV[0] =~ m/^-/) { shift @ARGV; shift @ARGV if @ARGV; }
exec("$FindBin::Bin/run.pl", @ARGV) or die "queue.pl: cannot exec run.pl\n";
