#!/usr/bin/env perl
# Minimal local job runner with the Kaldi run.pl calling convention
# (fresh implementation):
#   run.pl [JOB=1:N] <logfile> <command...>
# JOB ranges fan out N local processes with JOB substituted in the log
# path and command; exit nonzero if any job fails.

use strict;
use warnings;

my $jobname;
my ($jstart, $jend) = (1, 1);
my @args = @ARGV;

# ignore scheduler-style options other tools may pass
while (@args and $args[0] =~ m/^-/) {
    shift @args;
    shift @args if @args;  # assume option takes a value
}

if (@args and $args[0] =~ m/^([A-Za-z_][A-Za-z0-9_]*)=(\d+):(\d+)$/) {
    ($jobname, $jstart, $jend) = ($1, $2, $3);
    shift @args;
} elsif (@args and $args[0] =~ m/^([A-Za-z_][A-Za-z0-9_]*)=(\d+)$/) {
    ($jobname, $jstart, $jend) = ($1, $2, $2);
    shift @args;
}

die "run.pl: usage: run.pl [JOB=1:N] <logfile> <command...>\n" unless @args >= 2;
my $logfile = shift @args;
# Re-quote argv elements that contain whitespace so they survive the
# round-trip through "bash -c" (escaped \| pipes arrive as bare "|"
# single-token args and stay unquoted shell operators).
my @quoted;
for my $arg (@args) {
    if ($arg =~ m/^\S+$/) {
        push @quoted, $arg;
    } elsif ($arg =~ m/"/) {
        push @quoted, "'" . $arg . "'";
    } else {
        push @quoted, '"' . $arg . '"';
    }
}
my $command = join(" ", @quoted);

my @pids;
for my $job ($jstart .. $jend) {
    my $log = $logfile;
    my $cmd = $command;
    if (defined $jobname) {
        $log =~ s/$jobname/$job/g;
        $cmd =~ s/$jobname/$job/g;
    }
    my $pid = fork();
    die "run.pl: fork failed: $!\n" unless defined $pid;
    if ($pid == 0) {
        if ($log =~ m|/|) {
            (my $dir = $log) =~ s|/[^/]+$||;
            system("mkdir -p $dir");
        }
        open(my $lfh, ">", $log) or die "run.pl: cannot open $log\n";
        print $lfh "# $cmd\n# started " . localtime() . "\n";
        close $lfh;
        my $ret = system("bash", "-c", "( $cmd ) >>$log 2>&1");
        open($lfh, ">>", $log) or exit(1);
        print $lfh "# finished " . localtime() . " status " . ($ret >> 8) . "\n";
        close $lfh;
        exit($ret == 0 ? 0 : 1);
    }
    push @pids, $pid;
}

my $failed = 0;
for my $pid (@pids) {
    waitpid($pid, 0);
    $failed++ if $? != 0;
}
if ($failed) {
    print STDERR "run.pl: $failed / " . scalar(@pids) . " jobs failed; see $logfile\n";
    exit 1;
}
exit 0;
