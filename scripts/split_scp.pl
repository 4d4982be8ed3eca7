#!/usr/bin/env perl
# Split an scp file into N roughly-equal parts (fresh implementation of
# the Kaldi utils/split_scp.pl contract):
#   split_scp.pl -j N k in.scp out.scp   # write the k-th of N parts (0-based)
#   split_scp.pl in.scp out1.scp out2.scp ...

use strict;
use warnings;

my ($num_jobs, $job_id);
if (@ARGV >= 3 and $ARGV[0] eq "-j") {
    shift;
    $num_jobs = shift;
    $job_id = shift;
    die "split_scp.pl: bad -j args\n"
        unless $num_jobs =~ /^\d+$/ and $job_id =~ /^\d+$/
               and $job_id < $num_jobs;
}

my $in = shift or die "split_scp.pl: missing input scp\n";
open(my $fh, "<", $in) or die "split_scp.pl: cannot open $in\n";
my @lines = <$fh>;
close $fh;

if (defined $num_jobs) {
    my $out = shift or die "split_scp.pl: missing output scp\n";
    open(my $ofh, ">", $out) or die "split_scp.pl: cannot open $out\n";
    # block split (preserves length-sorted locality like Kaldi)
    my $n = scalar(@lines);
    my $base = int($n / $num_jobs);
    my $rem = $n % $num_jobs;
    my $start = $job_id * $base + ($job_id < $rem ? $job_id : $rem);
    my $count = $base + ($job_id < $rem ? 1 : 0);
    print $ofh @lines[$start .. $start + $count - 1] if $count > 0;
    close $ofh;
} else {
    my @outs = @ARGV;
    die "split_scp.pl: no output files\n" unless @outs;
    my $k = scalar(@outs);
    my $n = scalar(@lines);
    my $base = int($n / $k);
    my $rem = $n % $k;
    my $start = 0;
    for my $i (0 .. $k - 1) {
        my $count = $base + ($i < $rem ? 1 : 0);
        open(my $ofh, ">", $outs[$i])
            or die "split_scp.pl: cannot open $outs[$i]\n";
        print $ofh @lines[$start .. $start + $count - 1] if $count > 0;
        close $ofh;
        $start += $count;
    }
}
